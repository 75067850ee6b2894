# -*- coding: utf-8 -*-
"""Sequence-parallel VAD: one movie's time axis sharded across a device mesh.

The single-chip pipeline (ops/vad._vad_program) already makes a movie one
launch; this module splits that launch across the chips of a slice along a
``time`` mesh axis — the SP complement to parallel/batch.py's DP. The three
ingredients map onto ICI collectives:

- **frontend + fusion** are per-window → embarrassingly shard-local;
- **the spectral recurrences** (EMA, min-statistics floor, hangover) are
  associative scans → each chip scans its shard locally, per-shard summaries
  are `all_gather`ed (a few floats per chip), and each chip applies the
  exclusive prefix of its predecessors — the cross-chip level of the same
  two-level decomposition ops/vad._blocked_scan uses within a chip;
- **the neural VAD's dilated convs** need ±`CONTEXT` windows of context →
  one `ppermute` halo exchange of normalized features with each neighbor
  (edge shards take zero halos, which is exactly the SAME-padding the
  monolithic program sees at the true signal boundary). Normalization
  statistics are global via `psum`.

Semantics target: numerically equivalent to ONE monolithic
``_vad_program`` call over the whole signal (fresh state, single chunk) —
pinned by tests/test_vad_shard.py on the virtual 8-device CPU mesh.
"""
import logging
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ffsubsync_tpu.models import neural_vad as nv
from ffsubsync_tpu.ops import vad as V
from ffsubsync_tpu.ops.pallas import frontend as plf

logger = logging.getLogger(__name__)


_affine = V._affine


def _exclusive_prefix(summary, combine, identity, axis_name):
    """Each chip's exclusive prefix of all earlier chips' scan summaries.

    ``summary`` is this chip's inclusive local total. The all_gather moves a
    few floats per chip over ICI; the D-element scan is replicated work.
    """
    gathered = jax.lax.all_gather(summary, axis_name)  # [D, ...]
    scanned = jax.lax.associative_scan(combine, gathered, axis=0)
    idx = jax.lax.axis_index(axis_name)
    take = lambda s, ident: jnp.where(  # noqa: E731
        idx > 0,
        jax.lax.dynamic_index_in_dim(
            s, jnp.maximum(idx - 1, 0), axis=0, keepdims=False
        ),
        jnp.asarray(ident, s.dtype),
    )
    return jax.tree_util.tree_map(take, scanned, identity)


def _exclusive_suffix(summary, combine, identity, axis_name, n_dev):
    """Mirror of :func:`_exclusive_prefix` from the RIGHT: each chip's
    combine of all LATER chips' scan summaries (for the pre-hangover's
    next-raw-vote suffix minimum)."""
    gathered = jax.lax.all_gather(summary, axis_name)  # [D, ...]
    scanned = jax.lax.associative_scan(
        combine, gathered, axis=0, reverse=True
    )
    idx = jax.lax.axis_index(axis_name)
    take = lambda s, ident: jnp.where(  # noqa: E731
        idx < n_dev - 1,
        jax.lax.dynamic_index_in_dim(
            s, jnp.minimum(idx + 1, n_dev - 1), axis=0, keepdims=False
        ),
        jnp.asarray(ident, s.dtype),
    )
    return jax.tree_util.tree_map(take, scanned, identity)


def _sharded_program(
    framed, dft_mel, dft_plain, mel_fb, band_sel, n_valid, nv_params,
    non_speech_label, window, wpad, mode, interpret, axis_name, n_dev,
):
    """Per-shard body (runs under shard_map). Returns local labels [T_loc]."""
    t_loc = framed.shape[0]
    idx = jax.lax.axis_index(axis_name)
    t0 = idx * t_loc
    t_global = t0 + jnp.arange(t_loc, dtype=jnp.int32)
    valid = (t_global < n_valid)[:, None]

    out = plf._frontend_call(
        plf.wire_to_frame(framed, window, wpad),
        dft_mel, dft_plain, mel_fb, band_sel, window, wpad, interpret,
    )
    logmel = out[:, plf.MEL_OFF : plf.MEL_OFF + plf.N_MELS]
    bands = out[:, plf.BAND_OFF : plf.BAND_OFF + plf.N_BANDS]

    # ---- spectral detector: local scans + cross-chip prefix ----------------
    e = jnp.maximum(bands, 1e-12)
    # the global EMA seed is the first window's energies (shard 0's e[0])
    e0 = jax.lax.all_gather(e[0], axis_name)[0]
    coef_a = jnp.where(valid, 1.0 - V._ENERGY_EMA_ALPHA, 1.0)
    coef_b = jnp.where(valid, V._ENERGY_EMA_ALPHA * e, 0.0)
    loc_a, loc_b = V._blocked_scan(
        _affine, (coef_a, coef_b), (jnp.float32(1.0), jnp.float32(0.0))
    )
    pref_a, pref_b = _exclusive_prefix(
        (loc_a[-1], loc_b[-1]),
        _affine,
        (jnp.float32(1.0), jnp.float32(0.0)),
        axis_name,
    )
    big_a = pref_a[None, :] * loc_a
    big_b = loc_a * pref_b[None, :] + loc_b
    ema_seq = big_a * e0[None, :] + big_b
    ln_ema = jnp.log(ema_seq)
    lng = jnp.float32(np.log(V._NOISE_FLOOR_GROWTH))
    tt = t_global.astype(jnp.float32)[:, None] * lng
    shifted = jnp.where(valid, ln_ema - tt, jnp.inf)
    loc_min = V._blocked_scan(jnp.minimum, shifted, jnp.float32(jnp.inf))
    pref_min = _exclusive_prefix(
        loc_min[-1], jnp.minimum, jnp.float32(jnp.inf), axis_name
    )
    cummin = jnp.minimum(loc_min, pref_min[None, :])
    ln_noise = tt + cummin
    snr_db = (10.0 / np.log(10.0)) * (ln_ema - ln_noise)
    weights = jnp.asarray(V._BAND_WEIGHTS)
    score = jnp.dot(snr_db, weights) / V._BAND_WEIGHTS.sum()

    # spectral-motion duty-cycle gate (ops/vad._webrtc_from_bands): the
    # previous window's normalized spectrum crosses the shard boundary as a
    # ONE-ROW ppermute halo (shard 0 diffs its first window against itself,
    # matching the monolithic fresh-state flux[0] == 0), and the ±K moving-
    # indicator box gets K-row halos from each neighbor — after which the
    # centered fraction is shard-local prefix-sum work, exactly equal to the
    # monolithic global box
    mel = jnp.exp(logmel)
    p = mel / jnp.sum(mel, axis=1, keepdims=True)
    prev_row = jax.lax.ppermute(
        p[-1], axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    prev_row = jnp.where(idx > 0, prev_row, p[0])
    prev = jnp.concatenate([prev_row[None, :], p[:-1]], axis=0)
    flux = 0.5 * jnp.sum(jnp.abs(p - prev), axis=1)
    noise_frac = jnp.sum(jnp.exp(ln_noise), axis=1) / jnp.sum(ema_seq, axis=1)
    flux_c = jnp.maximum(flux - V._FLUX_NOISE_C * noise_frac, 0.0)
    k = V._FLUX_BOX_K
    active = (score > V._SNR_THRESHOLD_DB) & valid[:, 0]
    moving = (flux_c > V._FLUX_MOVE_THRESHOLD) & valid[:, 0]
    ind = jnp.stack(
        [jnp.where(moving & active, 1.0, 0.0), jnp.where(active, 1.0, 0.0)],
        axis=1,
    )  # [T_loc, 2]: (moving-and-active, active)
    m_left = jax.lax.ppermute(
        ind[-k:], axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    m_right = jax.lax.ppermute(
        ind[:k], axis_name, [(i + 1, i) for i in range(n_dev - 1)]
    )
    m_left = jnp.where(idx > 0, m_left, 0.0)
    m_right = jnp.where(idx < n_dev - 1, m_right, 0.0)
    ind_ext = jnp.concatenate([m_left, ind, m_right], axis=0)  # [T_loc+2K, 2]
    s_pad = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            V._blocked_scan(jnp.add, ind_ext, jnp.float32(0.0)),
        ],
        axis=0,
    )
    t_loc_idx = jnp.arange(t_loc, dtype=jnp.int32)
    e_idx = t_loc_idx + k  # ext position of local window t
    lo = e_idx - jnp.minimum(k, t_global)
    hi = e_idx + jnp.minimum(k, n_valid - 1 - t_global)
    hi_c = jnp.clip(hi, 0, t_loc + 2 * k - 1)
    sums = jnp.take(s_pad, hi_c + 1, axis=0) - jnp.take(s_pad, lo, axis=0)
    frac = sums[:, 0] / jnp.maximum(sums[:, 1], 1.0)

    # sustained-music veto (ops/vad constants block): the dB energy track
    # crosses shard boundaries as ±_SYL_LOOKBACK-row ppermute halos, after
    # which the band-pass box means and the boxed |AM| are shard-local
    # prefix-sum work — every bp value a local window's ±_FLUX_BOX_K box
    # consumes has its full ±_SYL_LONG_K context inside the ext array
    big_l = V._SYL_LOOKBACK
    ldb = (10.0 / np.log(10.0)) * jnp.log(
        jnp.maximum(jnp.sum(e, axis=1), jnp.sum(jnp.exp(ln_noise), axis=1))
    )
    ldb = jnp.where(valid[:, 0], ldb, 0.0)
    l_left = jax.lax.ppermute(
        ldb[-big_l:], axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    l_right = jax.lax.ppermute(
        ldb[:big_l], axis_name, [(i + 1, i) for i in range(n_dev - 1)]
    )
    l_left = jnp.where(idx > 0, l_left, 0.0)
    l_right = jnp.where(idx < n_dev - 1, l_right, 0.0)
    ldb_ext = jnp.concatenate([l_left, ldb, l_right])  # [T_loc + 2L]
    g_ldb = t0 - big_l + jnp.arange(t_loc + 2 * big_l, dtype=jnp.int32)
    vm = ((g_ldb >= 0) & (g_ldb < n_valid)).astype(jnp.float32)
    ps_ldb = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            V._blocked_scan(
                jnp.add, jnp.stack([ldb_ext, vm], axis=1), jnp.float32(0.0)
            ),
        ],
        axis=0,
    )

    def _boxmean(prefix, pos, k0):
        b_lo = jnp.maximum(pos - k0, 0)
        b_hi = jnp.minimum(pos + k0, prefix.shape[0] - 2)
        s = jnp.take(prefix, b_hi + 1, axis=0) - jnp.take(prefix, b_lo, axis=0)
        return s[:, 0] / jnp.maximum(s[:, 1], 1.0)

    ext_idx = jnp.arange(t_loc + 2 * big_l, dtype=jnp.int32)
    bp = _boxmean(ps_ldb, ext_idx, V._SYL_SHORT_K) - _boxmean(
        ps_ldb, ext_idx, V._SYL_LONG_K
    )
    ps_bp = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            V._blocked_scan(
                jnp.add,
                jnp.stack([jnp.abs(bp) * vm, vm], axis=1),
                jnp.float32(0.0),
            ),
        ],
        axis=0,
    )
    sylmod = _boxmean(ps_bp, t_loc_idx + big_l, V._FLUX_BOX_K)

    # transient-train veto (ops/vad constants block): fast band-pass needs
    # only ±_SYL_SHORT_K context, subsumed by the ±_SYL_LOOKBACK halos
    bpf = _boxmean(ps_ldb, ext_idx, V._FAST_SHORT_K) - _boxmean(
        ps_ldb, ext_idx, V._SYL_SHORT_K
    )
    ps_bpf = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            V._blocked_scan(
                jnp.add,
                jnp.stack([jnp.abs(bpf) * vm, vm], axis=1),
                jnp.float32(0.0),
            ),
        ],
        axis=0,
    )
    fastmod = _boxmean(ps_bpf, t_loc_idx + big_l, V._FLUX_BOX_K)

    raw = (
        active
        & moving
        & (frac > V._FLUX_FRAC_THRESHOLD)
        & (sylmod > V._SYL_MOD_THRESHOLD)
        & (fastmod <= V._FAST_MOD_MAX)
    )
    marked = jnp.where(raw, t_global, -(1 << 30))
    loc_max = V._blocked_scan(jnp.maximum, marked, jnp.int32(-(1 << 30)))
    pref_max = _exclusive_prefix(
        loc_max[-1], jnp.maximum, jnp.int32(-(1 << 30)), axis_name
    )
    last = jnp.maximum(loc_max, pref_max)
    # pre-hangover (ops/vad constants block): suffix minimum of raw-vote
    # indices — local reverse scan + the combine of all later shards
    marked_n = jnp.where(raw, t_global, (1 << 30))
    loc_min_n = jnp.flip(
        V._blocked_scan(jnp.minimum, jnp.flip(marked_n), jnp.int32(1 << 30))
    )
    suf_min = _exclusive_suffix(
        loc_min_n[0], jnp.minimum, jnp.int32(1 << 30), axis_name, n_dev
    )
    nxt = jnp.minimum(loc_min_n, suf_min)
    speech_fuse = t_global - last < V._HANGOVER_WINDOWS
    pre = nxt - t_global < V._PRE_HANGOVER_WINDOWS
    # standalone --vad webrtc reads the pre-hangover strength stream;
    # fusion modes read the trailing-only boolean one
    # (ops/vad._webrtc_from_bands docstring)
    if mode == "webrtc":
        strength = jnp.where(
            speech_fuse, 1.0, jnp.where(pre, V._PRE_HANGOVER_WEIGHT, 0.0)
        )
        webrtc_labels = (
            non_speech_label + (1.0 - non_speech_label) * strength
        )
    else:
        webrtc_labels = jnp.where(speech_fuse, 1.0, non_speech_label)

    # ---- neural detector: global normalization + halo exchange -------------
    ctx = nv.CONTEXT
    denom = jnp.maximum(n_valid, 1)
    mean = (
        jax.lax.psum(jnp.sum(logmel * valid, axis=0, keepdims=True), axis_name)
        / denom
    )
    var = (
        jax.lax.psum(
            jnp.sum(((logmel - mean) * valid) ** 2, axis=0, keepdims=True),
            axis_name,
        )
        / denom
    )
    x = (logmel - mean) / (jnp.sqrt(var) + 1e-3)
    x = jnp.where(valid, x, 0.0)
    # halo exchange: my last ctx rows go right, my first ctx rows go left;
    # edge shards take zeros (the signal boundary's SAME padding)
    from_left = jax.lax.ppermute(
        x[-ctx:], axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )
    from_right = jax.lax.ppermute(
        x[:ctx], axis_name, [(i + 1, i) for i in range(n_dev - 1)]
    )
    from_left = jnp.where(idx > 0, from_left, 0.0)
    from_right = jnp.where(idx < n_dev - 1, from_right, 0.0)
    x_ext = jnp.concatenate([from_left, x, from_right], axis=0)
    # validity of ext rows in GLOBAL terms: halo rows outside [0, n_valid)
    # (shard 0's left, the last shard's right, tail padding) are masked so
    # the net's aux-channel statistics match the monolithic program's
    g_ext = t0 - ctx + jnp.arange(t_loc + 2 * ctx, dtype=jnp.int32)
    vm_ext = ((g_ext >= 0) & (g_ext < n_valid)).astype(x_ext.dtype)
    probs = nv._net(nv_params, x_ext, vm_ext)[ctx : ctx + t_loc]
    silero_labels = 1.0 - (1.0 - probs) * (1.0 - non_speech_label)

    return V._select_labels(mode, webrtc_labels, silero_labels)


def make_sharded_detector(
    mesh: Mesh,
    mode: str,
    sample_rate: int,
    frame_rate: int,
    non_speech_label: float,
    axis_name: str = "time",
):
    """Build ``detect(pcm) -> labels`` sharding one signal's time axis.

    The returned callable stages the PCM on the host, pads the window axis to
    a per-shard multiple of ``max(CONTEXT, _SCAN_BLOCK-compatible)``, and runs
    the whole fused VAD as ONE sharded program (labels come back as the
    global [n_windows] array).
    """
    import os

    from ffsubsync_tpu.models.neural_vad import NeuralVAD
    from ffsubsync_tpu.ops.features import prepare_staged_input

    n_dev = int(np.prod(mesh.devices.shape))
    if mode == "webrtc":
        # the neural branch is dead code under this mode; zero params keep
        # tracing happy without loading (or warning about) weights — same
        # pattern as ops/vad._make_onelaunch_detector
        from ffsubsync_tpu.models.neural_vad import init_params

        params = jax.tree_util.tree_map(
            jnp.zeros_like, init_params(jax.random.PRNGKey(0))
        )
    else:
        params = NeuralVAD.load_default(
            frame_rate=frame_rate, sample_rate=sample_rate
        ).params
    interpret = os.environ.get("FFS_TPU_PALLAS_INTERPRET") == "1"
    jitted = {}  # (window, wpad) -> jitted sharded program

    def _program(window, wpad):
        if (window, wpad) not in jitted:
            fn = shard_map(
                partial(
                    _sharded_program,
                    window=window,
                    wpad=wpad,
                    mode=mode,
                    interpret=interpret,
                    axis_name=axis_name,
                    n_dev=n_dev,
                ),
                mesh=mesh,
                in_specs=(P(axis_name), P(), P(), P(), P(), P(), P(), P()),
                out_specs=P(axis_name),
                # the pallas frontend's custom call can't declare its
                # varying-across-mesh axes; skip the replication check
                check_vma=False,
            )
            jitted[(window, wpad)] = jax.jit(fn)
        return jitted[(window, wpad)]

    def detect(pcm):
        """PCM (int16 array or s16le bytes) → :class:`LazySpeechSignal`.

        The global label array stays a sharded device value — the aligner
        compacts it in place, preserving the labels-never-visit-the-host
        invariant; numpy consumers still get values via ``__array__``."""
        pcm = V._pcm_bytes_to_i16(pcm)
        framed, mats, n_windows = prepare_staged_input(
            pcm, frame_rate, sample_rate
        )
        t_pad = framed.shape[0]
        # every shard needs >= CONTEXT rows for the halo slices, the total
        # must divide evenly across the mesh, and each shard's row count
        # must stay TILE_T-aligned — a partial pallas grid block would read
        # past the shard's rows (undefined values)
        per = -(-t_pad // n_dev)
        per = max(per, nv.CONTEXT)
        per = -(-per // plf.TILE_T) * plf.TILE_T
        full = per * n_dev
        if full > t_pad:
            # wire-format silence rows, NOT bare zeros: the packed 6-bit
            # wire's silence is a nonzero byte pattern
            framed = np.concatenate(
                [framed, plf.wire_silence_rows(framed, full - t_pad, mats.window)]
            )
        sharded = NamedSharding(mesh, P(axis_name))
        # device_put on the numpy array slices host-side and sends each
        # shard straight to its device — no whole-buffer staging through
        # the default device
        framed_dev = jax.device_put(framed, sharded)
        labels = _program(mats.window, mats.wpad)(
            framed_dev,
            mats.dft_mel,
            mats.dft_plain,
            mats.mel_fb,
            mats.band_sel,
            jnp.int32(n_windows),
            params,
            jnp.float32(non_speech_label),
        )
        return V.LazySpeechSignal([(labels, n_windows)])

    return detect


def maybe_sharded_detector(
    vad: str, sample_rate: int, frame_rate: int, non_speech_label: float
):
    """Product wiring: a sharded detector when the environment asks for one.

    Returns None unless ``FFS_TPU_SP_VAD=1``, more than one device is
    attached, and the ``--vad`` mode maps onto the fused device program
    (auditok's host tokenizer has no sharded form). The media layer then
    buffers the whole signal and runs ONE sequence-parallel launch instead
    of the chunked single-chip pipeline — the right trade on a multi-chip
    slice with fast storage, where decode no longer dominates.
    """
    import os

    if os.environ.get("FFS_TPU_SP_VAD") != "1":
        return None
    name = vad.split("subs_then_")[-1]
    if "fused" in name:
        mode = name.split(":", 1)[1] if ":" in name else "weighted"
    elif "webrtc" in name:
        mode = "webrtc"
    elif "silero" in name:
        mode = "silero"
    else:
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    logger.info(
        "sequence-parallel VAD: sharding the signal over %d devices",
        len(devices),
    )
    mesh = Mesh(np.array(devices), ("time",))
    return make_sharded_detector(
        mesh, mode, sample_rate, frame_rate, non_speech_label
    )
