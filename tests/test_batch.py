# -*- coding: utf-8 -*-
"""Batch sync API: many jobs, one sharded candidate search."""
import numpy as np
import pytest

from ffsubsync_tpu.batch import sync_batch
from ffsubsync_tpu.constants import SAMPLE_RATE

SPANS = [(4.0, 6.5), (9.0, 11.0), (15.5, 18.0), (22.0, 23.5), (27.0, 30.0)]


def _ts(t: float) -> str:
    ms = int(round(t * 1000))
    return "%02d:%02d:%02d,%03d" % (
        ms // 3600000, ms % 3600000 // 60000, ms % 60000 // 1000, ms % 1000
    )


def _srt(spans) -> str:
    return "".join(
        "%d\n%s --> %s\nline %d\n\n" % (i + 1, _ts(a), _ts(b), i + 1)
        for i, (a, b) in enumerate(spans)
    )


def _make_job(tmp_path, name, shift, kind="srt"):
    ref = tmp_path / ("%s_ref.srt" % name)
    ref.write_text(_srt(SPANS))
    srtin = tmp_path / ("%s_in.srt" % name)
    srtin.write_text(_srt([(a - shift, b - shift) for a, b in SPANS]))
    srtout = tmp_path / ("%s_out.srt" % name)
    if kind == "npz":
        npz = tmp_path / ("%s_ref.npz" % name)
        signal = np.zeros(int(35 * SAMPLE_RATE))
        for a, b in SPANS:
            signal[int(a * SAMPLE_RATE) : int(b * SAMPLE_RATE)] = 1.0
        np.savez_compressed(str(npz), speech=signal)
        return (str(npz), str(srtin), str(srtout))
    return (str(ref), str(srtin), str(srtout))


def test_sync_batch_recovers_per_job_offsets(tmp_path):
    shifts = [3.0, -1.25, 0.75, 2.5]
    jobs = [
        _make_job(tmp_path, "j%d" % i, s, kind="npz" if i == 2 else "srt")
        for i, s in enumerate(shifts)
    ]
    results = sync_batch(jobs)
    assert len(results) == len(jobs)
    for r, shift in zip(results, shifts):
        assert r["error"] is None
        assert r["sync_was_successful"]
        assert r["offset_seconds"] == pytest.approx(shift, abs=0.02)
        # output actually written and shifted back
        out_text = open(r["srtout"]).read()
        assert _ts(SPANS[0][0]).rsplit(",", 1)[0] in out_text


def test_sync_batch_isolates_failing_jobs(tmp_path):
    good = _make_job(tmp_path, "ok", 1.0)
    bad = (str(tmp_path / "missing_ref.srt"), good[1], str(tmp_path / "x.srt"))
    results = sync_batch([bad, good])
    assert results[0]["error"] is not None
    assert not results[0]["sync_was_successful"]
    assert results[1]["sync_was_successful"]
    assert results[1]["offset_seconds"] == pytest.approx(1.0, abs=0.02)


def test_batch_cli_manifest(tmp_path, capsys, monkeypatch):
    import sys

    from ffsubsync_tpu import batch as batch_mod

    jobs = [_make_job(tmp_path, "m%d" % i, s) for i, s in enumerate([2.0, -0.5])]
    manifest = tmp_path / "jobs.tsv"
    manifest.write_text(
        "".join("%s\t%s\t%s\n" % job for job in jobs) + "# comment line\n"
    )
    monkeypatch.setattr(sys, "argv", ["ffs-tpu-batch", str(manifest)])
    rc = batch_mod.main()
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK" in out


def test_sync_batch_handles_ass_input(tmp_path):
    """Non-srt subtitle inputs are parsed by their real format."""
    ref = tmp_path / "ref.srt"
    ref.write_text(_srt(SPANS))
    late = tmp_path / "late.ass"
    late.write_text(
        "[Script Info]\nTitle: t\n\n[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text\n"
        + "".join(
            "Dialogue: 0,%s,%s,Default,,0,0,0,,line %d\n"
            % (
                "0:%02d:%05.2f" % ((a - 1.0) // 60, (a - 1.0) % 60),
                "0:%02d:%05.2f" % ((b - 1.0) // 60, (b - 1.0) % 60),
                i,
            )
            for i, (a, b) in enumerate(SPANS)
        )
    )
    out = tmp_path / "out.ass"
    [result] = sync_batch([(str(ref), str(late), str(out))])
    assert result["error"] is None
    assert result["offset_seconds"] == pytest.approx(1.0, abs=0.02)
    assert "Dialogue:" in out.read_text()


def test_sync_batch_rejects_empty_speech(tmp_path):
    ref = tmp_path / "ref.srt"
    ref.write_text(_srt(SPANS))
    empty = tmp_path / "empty.srt"
    empty.write_text("\n")
    out = tmp_path / "out.srt"
    [result] = sync_batch([(str(ref), str(empty), str(out))])
    assert result["error"] is not None
    assert not result["sync_was_successful"]


def test_sync_batch_flags_low_quality_but_still_writes(tmp_path):
    """A 45 s offset is inside the 60 s search bound but beyond the 30 s
    quality bound: the job must be flagged (not successful, reasons recorded)
    while the output is still written for human review."""
    job = _make_job(tmp_path, "lowq", -45.0)
    [result] = sync_batch([job])
    assert result["error"] is None
    assert result["offset_seconds"] == pytest.approx(-45.0, abs=0.02)
    assert not result["sync_was_successful"]
    assert any("offset" in r for r in result["quality_reasons"])
    assert open(result["srtout"]).read()  # flagged, but written


def test_sync_batch_gss_refines_ratio(tmp_path):
    """--gss in batch mode: the batched grid-refinement rounds must recover
    a framerate ratio OUTSIDE the discrete grid (the single-file gss
    contract, sync._run_gss_search, batched over jobs)."""
    true_ratio = 1.0137  # not in FRAMERATE_RATIOS or their inverses
    shifts = [2.0, -1.5]
    jobs = []
    for i, shift in enumerate(shifts):
        ref = tmp_path / ("g%d_ref.srt" % i)
        ref.write_text(_srt(SPANS))
        srtin = tmp_path / ("g%d_in.srt" % i)
        # per-job marker text: the refinement rounds rebuild sources from
        # each job's OWN srtin, so job 0's output must never carry job 1's
        # lines (regression: a late-binding maker closure did exactly that)
        srtin.write_text(
            _srt([(a / true_ratio - shift, b / true_ratio - shift)
                  for a, b in SPANS]).replace("line", "job%d line" % i)
        )
        jobs.append((str(ref), str(srtin), str(tmp_path / ("g%d_out.srt" % i))))
    results = sync_batch(jobs, gss=True)
    for i, (r, shift) in enumerate(zip(results, shifts)):
        assert r["error"] is None, r["error"]
        assert r["framerate_scale_factor"] == pytest.approx(
            true_ratio, abs=2e-3
        )
        out_text = open(r["srtout"]).read()
        assert _ts(SPANS[0][0]).rsplit(",", 1)[0] in out_text
        assert "job%d line" % i in out_text
        assert "job%d line" % (1 - i) not in out_text


def test_sync_batch_output_encoding_same_preserves_input(tmp_path):
    """output_encoding='same' keeps each input's detected encoding (the
    single-file --output-encoding semantics), instead of forcing utf-8."""
    ref = tmp_path / "ref.srt"
    ref.write_text(_srt(SPANS))
    srtin = tmp_path / "in.srt"
    body = _srt([(a - 1.0, b - 1.0) for a, b in SPANS]).replace(
        "line 1", "ligne n° 1"
    )
    srtin.write_bytes(body.encode("cp1252"))
    out = tmp_path / "out.srt"
    [result] = sync_batch(
        [(str(ref), str(srtin), str(out))], output_encoding="same"
    )
    assert result["error"] is None
    raw = out.read_bytes()
    assert "ligne n° 1".encode("cp1252") in raw
    [result] = sync_batch(
        [(str(ref), str(srtin), str(out))], output_encoding="utf-8"
    )
    assert "ligne n° 1".encode("utf-8") in out.read_bytes()


def test_sync_batch_pgs_reference(tmp_path, monkeypatch):
    """A PGS-stream reference syncs through the batch path (the same
    make_reference_extractor dispatch as the single-file CLI)."""
    import ffsubsync_tpu.media.pgs as pgs

    packets = [
        {"pts_time": str(a), "duration_time": str(b - a), "size": "4000"}
        for a, b in SPANS
    ]
    streams = [
        {"codec_type": "subtitle", "codec_name": "hdmv_pgs_subtitle",
         "index": 2}
    ]
    monkeypatch.setattr(
        pgs, "ffprobe_json",
        lambda *a, **k: {"streams": streams, "packets": packets},
    )
    srtin = tmp_path / "in.srt"
    srtin.write_text(_srt([(a - 2.0, b - 2.0) for a, b in SPANS]))
    out = tmp_path / "out.srt"
    [result] = sync_batch(
        [("movie.mkv", str(srtin), str(out))],
        ref_options={"pgs_ref_stream": "auto"},
    )
    assert result["error"] is None, result["error"]
    assert result["offset_seconds"] == pytest.approx(2.0, abs=0.02)
    assert _ts(SPANS[0][0]).rsplit(",", 1)[0] in out.read_text()


def test_sync_batch_requires_output_paths(tmp_path):
    job = _make_job(tmp_path, "q", 1.0)
    with pytest.raises(ValueError, match="output path"):
        sync_batch([(job[0], job[1], None)])


def test_write_file_stdout_does_not_close_fd(capsys):
    """write_file(None) streams to stdout without closing the process fd."""
    from ffsubsync_tpu.subs import formats

    doc = formats.parse_document(
        "1\n00:00:05,000 --> 00:00:07,500\nHello.\n", "srt", "utf-8"
    )
    doc.write_file(None)
    doc.write_file(None)  # second write must not hit a closed fd
    print("still-alive")  # nor the caller's own stdout


def test_batch_aligner_accepts_lazy_device_refs():
    """BatchAligner must score LazySpeechSignal refs identically to their
    materialized host values (device pad/stack path)."""
    import numpy as np

    import jax.numpy as jnp

    from ffsubsync_tpu.ops.vad import LazySpeechSignal
    from ffsubsync_tpu.parallel.batch import BatchAligner
    from ffsubsync_tpu.subs.raster import rasterize_intervals

    rng = np.random.RandomState(0)
    aligner = BatchAligner()
    refs_np, refs_lazy, cands = [], [], []
    for b in range(3):
        spans = []
        t = 1.0 + b
        for _ in range(10):
            ln = rng.uniform(0.5, 2.0)
            spans.append((t, t + ln))
            t += ln + rng.uniform(0.5, 2.0)
        sig = rasterize_intervals(spans, 100).materialize()
        refs_np.append(np.asarray(sig, np.float32))
        # split into two device chunks like the async pipeline would
        half = len(sig) // 2
        refs_lazy.append(
            LazySpeechSignal([jnp.asarray(sig[:half]), jnp.asarray(sig[half:])])
        )
        shift = 0.5 * (b + 1)
        cands.append(
            [rasterize_intervals([(a - shift, e - shift) for a, e in spans], 100)]
        )
    out_np = aligner.align_batch(refs_np, cands, max_offset_samples=500)
    out_lazy = aligner.align_batch(refs_lazy, cands, max_offset_samples=500)
    for b, (rn, rl) in enumerate(zip(out_np, out_lazy)):
        assert rl[0].offset == rn[0].offset == int(0.5 * (b + 1) * 100)
        assert rl[0].score == pytest.approx(rn[0].score, rel=1e-5)
