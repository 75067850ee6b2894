# -*- coding: utf-8 -*-
"""End-to-end srt↔srt sync through the public run()/CLI surface."""
import os

import numpy as np
import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.subs.parser import SubtitleParser
from ffsubsync_tpu.subs.transforms import scale_document, shift_document
from ffsubsync_tpu.sync import run

REF_SRT = """1
00:00:05,000 --> 00:00:07,500
Hello there.

2
00:00:12,250 --> 00:00:15,000
General Kenobi!

3
00:00:21,000 --> 00:00:24,400
You are a bold one.

4
00:00:31,700 --> 00:00:34,000
Back away!

5
00:00:40,000 --> 00:00:43,500
I will deal with this Jedi slime myself.

6
00:00:51,000 --> 00:00:54,200
Your move.

7
00:01:01,000 --> 00:01:04,000
You fool.
"""


def _write(tmp_path, name, text):
    path = os.path.join(str(tmp_path), name)
    with open(path, "w") as f:
        f.write(text)
    return path


def _make_unsynced(tmp_path, ref_path, offset_seconds, scale=1.0, name="in.srt"):
    parser = SubtitleParser()
    parser.fit(ref_path)
    doc = parser.subs_
    if scale != 1.0:
        doc = scale_document(doc, 1.0 / scale)
    doc = shift_document(doc, -offset_seconds / scale)
    out = os.path.join(str(tmp_path), name)
    doc.write_file(out)
    return out


def _parse_times(path):
    parser = SubtitleParser()
    parser.fit(path)
    return [(c.start_seconds, c.end_seconds) for c in parser.subs_]


def test_srt_to_srt_offset_recovery(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 2.5)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args([ref, "-i", srtin, "-o", srtout])
    result = run(args)
    assert result["retval"] == 0
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(2.5, abs=0.02)
    assert result["framerate_scale_factor"] == 1.0
    ref_times = _parse_times(ref)
    out_times = _parse_times(srtout)
    for (rs, re_), (os_, oe) in zip(ref_times, out_times):
        assert abs(rs - os_) <= 0.02
        assert abs(re_ - oe) <= 0.02


@pytest.mark.parametrize("true_ratio", [24.0 / 23.976, 23.976 / 25.0])
def test_framerate_ratio_recovery(tmp_path, true_ratio):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, -1.75, scale=true_ratio)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args([ref, "-i", srtin, "-o", srtout])
    result = run(args)
    assert result["sync_was_successful"]
    assert result["framerate_scale_factor"] == pytest.approx(true_ratio, abs=1e-3)
    assert result["offset_seconds"] == pytest.approx(-1.75, abs=0.05)


def test_no_fix_framerate(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 1.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--no-fix-framerate"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["framerate_scale_factor"] == 1.0


def test_gss(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    true_ratio = 1.03
    srtin = _make_unsynced(tmp_path, ref, 0.8, scale=true_ratio)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args([ref, "-i", srtin, "-o", srtout, "--gss"])
    result = run(args)
    assert result["sync_was_successful"]
    assert result["framerate_scale_factor"] == pytest.approx(true_ratio, abs=2e-3)


def test_apply_offset_seconds_without_reference(tmp_path):
    srtin = _write(tmp_path, "in.srt", REF_SRT)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [srtin, "-o", srtout, "--apply-offset-seconds", "3.0", "-i", srtin]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(3.0)
    in_times = _parse_times(srtin)
    out_times = _parse_times(srtout)
    for (is_, ie), (os_, oe) in zip(in_times, out_times):
        assert os_ == pytest.approx(is_ + 3.0, abs=1e-3)
        assert oe == pytest.approx(ie + 3.0, abs=1e-3)


def test_skip_sync_flag(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 2.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args([ref, "-i", srtin, "-o", srtout, "--skip-sync"])
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == 0.0
    assert _parse_times(srtout) == pytest.approx(_parse_times(srtin))


def test_serialize_speech_and_npz_reference(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 1.25)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--serialize-speech"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    npz_path = os.path.splitext(ref)[0] + ".npz"
    assert os.path.exists(npz_path)
    speech = np.load(npz_path)["speech"]
    assert speech.sum() > 0
    # use the serialized array as the reference now
    srtout2 = os.path.join(str(tmp_path), "out2.srt")
    args2 = make_parser().parse_args([npz_path, "-i", srtin, "-o", srtout2])
    result2 = run(args2)
    assert result2["sync_was_successful"]
    assert result2["offset_seconds"] == pytest.approx(
        result["offset_seconds"], abs=0.02
    )


def test_suppress_output_below_threshold(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 0.5)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout,
         "--suppress-output-if-offset-less-than", "10.0"]
    )
    result = run(args)
    assert not os.path.exists(srtout)
    assert result["offset_seconds"] == pytest.approx(0.5, abs=0.02)


def test_overwrite_input(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 2.0)
    args = make_parser().parse_args([ref, "-i", srtin, "--overwrite-input"])
    result = run(args)
    assert result["sync_was_successful"]
    out_times = _parse_times(srtin)
    ref_times = _parse_times(ref)
    for (rs, _), (os_, _) in zip(ref_times, out_times):
        assert abs(rs - os_) <= 0.02


def test_multiple_inputs_require_overwrite(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    a = _make_unsynced(tmp_path, ref, 2.0, name="a.srt")
    b = _make_unsynced(tmp_path, ref, -3.0, name="b.srt")
    args = make_parser().parse_args([ref, "-i", a, b])
    assert run(args)["retval"] == 1  # refused without --overwrite-input
    args = make_parser().parse_args([ref, "-i", a, b, "--overwrite-input"])
    result = run(args)
    assert result["sync_was_successful"]
    for path in (a, b):
        for (rs, _), (os_, _) in zip(_parse_times(ref), _parse_times(path)):
            assert abs(rs - os_) <= 0.02


def test_merge_with_reference(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 1.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--merge-with-reference"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    merged = _parse_times(srtout)
    # all original cues merged pairwise -> same count as the reference
    assert len(merged) == len(_parse_times(ref))
    out_doc = SubtitleParser()
    out_doc.fit(srtout)
    assert all("\n" in c.content for c in out_doc.subs_)


def test_merge_requires_subtitle_reference(tmp_path):
    srtin = _write(tmp_path, "in.srt", REF_SRT)
    args = make_parser().parse_args(
        ["ref.mkv", "-i", srtin, "--merge-with-reference"]
    )
    assert run(args)["retval"] == 1


def test_sync_failure_isolated_per_input(tmp_path):
    """A broken input doesn't abort the other inputs (parity: per-srtin loop)."""
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    good = _make_unsynced(tmp_path, ref, 2.0, name="good.srt")
    bad = _write(tmp_path, "bad.srt", "not a subtitle file at all")
    args = make_parser().parse_args([ref, "-i", bad, good, "--overwrite-input"])
    result = run(args)
    assert not result["sync_was_successful"]
    # good input still synced
    for (rs, _), (os_, _) in zip(_parse_times(ref), _parse_times(good)):
        assert abs(rs - os_) <= 0.02


def test_profile_dir_writes_trace(tmp_path):
    """--profile-dir captures a jax.profiler trace of the sync."""
    ref = tmp_path / "ref.srt"
    late = tmp_path / "late.srt"
    out = tmp_path / "out.srt"
    ref.write_text(
        "1\n00:00:05,000 --> 00:00:07,000\nHello.\n\n"
        "2\n00:00:12,000 --> 00:00:14,000\nWorld.\n"
    )
    late.write_text(
        "1\n00:00:06,000 --> 00:00:08,000\nHello.\n\n"
        "2\n00:00:13,000 --> 00:00:15,000\nWorld.\n"
    )
    prof = tmp_path / "prof"
    args = make_parser().parse_args(
        [str(ref), "-i", str(late), "-o", str(out),
         "--profile-dir", str(prof)]
    )
    result = run(args)
    assert result["sync_was_successful"]
    traces = list(prof.rglob("*"))
    assert any(p.is_file() for p in traces), "no profiler output written"


def test_srt_sync_never_imports_jax(tmp_path):
    """A subtitle-reference sync is host-only end to end: it must complete
    with jax import-blocked (no device session, no jax import cost on
    machines without an ambient jax)."""
    import subprocess
    import sys
    import textwrap

    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 2.5)
    out = str(tmp_path / "out.srt")
    code = textwrap.dedent(
        """
        import sys
        # an ambient sitecustomize may have pre-imported jax; purge the cache
        # so the blocker governs any fresh import attempt
        for name in [n for n in sys.modules
                     if n == "jax" or n.startswith(("jax.", "jaxlib"))]:
            del sys.modules[name]
        class Block:
            def find_spec(self, name, path=None, target=None):
                if name == "jax" or name.startswith("jax."):
                    raise ImportError("jax blocked: " + name)
        sys.meta_path.insert(0, Block())
        # prove the blocker fires at all (a vacuous blocker passes trivially)
        try:
            import jax  # noqa: F401
        except ImportError:
            pass
        else:
            raise AssertionError("import blocker is vacuous")
        from ffsubsync_tpu.cli import make_parser
        from ffsubsync_tpu.sync import run
        args = make_parser().parse_args([%r, "-i", %r, "-o", %r])
        result = run(args)
        assert result["sync_was_successful"], result
        assert abs(result["offset_seconds"] - 2.5) < 0.02, result
        """
    ) % (str(ref), str(srtin), out)
    env = dict(os.environ)
    env.pop("PYTHONSTARTUP", None)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
