# -*- coding: utf-8 -*-
"""The eval-agreement harness's binding-bar check (EVAL.md contract).

``scripts/eval_vad_agreement.py --check-bars`` is the machine-checked form
of EVAL.md's quality bars; these tests pin the bar logic itself (thresholds,
tier scoping, None handling) without paying for a full synthetic eval run.
"""
import importlib.util
import os

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load(script="eval_vad_agreement.py"):
    path = os.path.join(_SCRIPTS, script)
    name = os.path.splitext(script)[0]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _report(rows):
    return {"mode": "synthetic", "per_scenario": rows}


def test_all_within_bars_passes():
    mod = _load()
    rows = {
        "clean": {"truth": 1.95, "fused": 1.95, "silero": 1.951, "webrtc": 1.9},
        "music_bed": {"truth": -3.05, "fused": -3.05, "silero": -3.05,
                      "webrtc": -3.045},
    }
    assert mod.check_bars(_report(rows), 12000) == []


def test_neural_bar_is_10ms_default_and_rate_independent():
    # 10 ms is the default neural bar; 'noisy' alone carries 30 ms (below)
    mod = _load()
    rows = {"clean": {"truth": 1.80, "fused": 1.82, "silero": 1.80}}
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "fused" in failures[0]
    # the neural bar binds at every analysis tier, not just 12 kHz
    assert mod.check_bars(_report(rows), 8000) == failures


def test_noisy_neural_bar_is_three_cells():
    # the 'noisy' scenario's neural bar is 30 ms: the 3-min clip's
    # correlation peak jitters 1-3 cells under a 4 dB pink bed (measured,
    # weights-independent, vanishes at 10-min length — check_bars docstring)
    mod = _load()
    rows = {"noisy": {"truth": 1.80, "fused": 1.83, "silero": 1.77}}
    assert mod.check_bars(_report(rows), 12000) == []
    rows = {"noisy": {"truth": 1.80, "silero": 1.76}}  # four cells: out
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "30 ms" in failures[0]


def test_noisy_10min_length_variant_binds_at_10ms():
    # the 10-minute noisy slot exists so the tight bar binds under the pink
    # bed somewhere (the 3-min slot's jitter is measured short-clip variance
    # — scripts/probe_noisy_jitter.py); it carries the DEFAULT 10 ms bar
    mod = _load()
    rows = {"noisy_10min": {"truth": 1.80, "fused": 1.80, "silero": 1.78}}
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "10 ms" in failures[0]
    rows = {"noisy_10min": {"truth": 1.80, "fused": 1.80, "silero": 1.79}}
    assert mod.check_bars(_report(rows), 12000) == []


def test_length_variant_slots_append_after_base_scenarios():
    # appending (never interleaving) keeps the base slots' truth draws
    # stable as variants are added — the seed-0 numbers in EVAL.md reproduce
    from ffsubsync_tpu.models.eval_data import MOVIE_SCENARIOS

    mod = _load()
    names = mod.all_scenarios()
    assert names[: len(MOVIE_SCENARIOS)] == tuple(MOVIE_SCENARIOS)
    assert "noisy_10min" in names[len(MOVIE_SCENARIOS) :]


def test_one_grid_cell_error_is_within_the_10ms_bar():
    # offsets are 100 Hz grid cells; exactly one cell off IS the 10 ms bar
    # and must pass despite float64 representation error (1.8 - 1.79 > 0.01)
    mod = _load()
    rows = {"clean": {"truth": 1.80, "fused": 1.80, "silero": 1.79}}
    assert mod.check_bars(_report(rows), 12000) == []
    rows = {"clean": {"truth": 1.80, "silero": 1.78}}  # two cells: out
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "silero" in failures[0]
    # same inclusivity on the webrtc 3-min bar (exactly 250 ms passes)
    rows = {"music_bed": {"truth": -3.05, "webrtc": -3.30}}
    assert mod.check_bars(_report(rows), 12000) == []


def test_webrtc_bars_scoped_to_12khz_tier():
    mod = _load()
    rows = {
        # 100 ms skew: inside the 3-min 250 ms envelope...
        "laughter_breaks": {"truth": -2.50, "webrtc": -2.40},
        # ...music_bed too (the multi-seed envelope, probe_webrtc_bias.py)
        "music_bed": {"truth": -3.05, "webrtc": -3.13},
        # ...but 300 ms is outside it anywhere
        "clean": {"truth": 1.00, "webrtc": 1.30},
    }
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "clean" in failures[0]
    # the webrtc-class kernel is tracked unbound at other tiers (EVAL.md)
    assert mod.check_bars(_report(rows), 8000) == []


def test_webrtc_music_10min_variants_bind_tighter():
    """The *_10min music variants carry the 150 ms bar — the 3-min slots'
    ±0.1-0.2 s short-clip variance collapses at 10-minute length (measured:
    scripts/probe_webrtc_bias.py / EVAL_webrtc_bias.json), so the tighter
    bound binds there, the noisy_10min pattern applied to the webrtc
    kernel."""
    mod = _load()
    rows = {
        "music_bed_10min": {"truth": 1.00, "webrtc": 1.12},  # inside 150
        "vocals_bed_10min": {"truth": 2.00, "webrtc": 2.18},  # outside
        "strings_bed": {"truth": 3.00, "webrtc": 3.18},  # 3-min: inside 250
    }
    failures = mod.check_bars(_report(rows), 12000)
    assert len(failures) == 1 and "vocals_bed_10min" in failures[0]


def test_window_gate_exempts_end_to_end_bound_conditions():
    # crowd_babble's window labels are perceptually ambiguous; its binding
    # check is the babble_breaks agreement scenario, so the window gate must
    # not fail on it (it IS still the reported worst number)
    mod = _load("eval_neural_vad.py")
    results = {
        "crowd_babble": {"silero": 0.78},
        "plucked_music": {"silero": 0.95},
    }
    worst, worst_gated, code = mod.gate_verdict(results)
    assert (worst, worst_gated, code) == (0.78, 0.95, 0)
    # a non-exempt condition under the bar still fails the gate
    results["plucked_music"]["silero"] = 0.85
    assert mod.gate_verdict(results)[2] == 1


def test_webrtc_applause_window_bar_pinned():
    # the transient-train veto's win (applause 0.004 -> 1.000) is pinned at
    # 0.5 so a gate-constants change cannot silently regress it
    mod = _load("eval_neural_vad.py")
    results = {
        "applause": {"silero": 1.0, "webrtc": 0.95},
        "plucked_music": {"silero": 0.95},
    }
    assert mod.gate_verdict(results)[2] == 0
    results["applause"]["webrtc"] = 0.3
    assert mod.gate_verdict(results)[2] == 1
    # absent webrtc results (e.g. --backends silero,fused) don't trip it
    del results["applause"]["webrtc"]
    assert mod.gate_verdict(results)[2] == 0


def test_failed_sync_counts_as_violation():
    mod = _load()
    rows = {"clean": {"truth": 0.0, "fused": None, "webrtc": None}}
    failures = mod.check_bars(_report(rows), 12000)
    assert ["failed to sync" in f for f in failures] == [True, True]
