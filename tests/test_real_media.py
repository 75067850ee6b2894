# -*- coding: utf-8 -*-
"""Real-media integration tier (opt-in, data-driven).

The reference's integration tests run the full CLI against REAL media listed
in a YAML config inside a private git submodule, gated on ``INTEGRATION=1``
plus data presence (/root/reference/tests/test_integration.py:34-87,
.gitmodules:1-3). This is the matching mechanism: point ``FFS_TPU_MEDIA_DIR``
at a local directory of real media and the case list in
``<media_dir>/cases.yaml`` (falling back to ``tests/real_media_cases.yaml``)
drives full CLI runs, accepted by the same >=99% rasterized-bitstring
agreement oracle. Without the env var (or without the files) every case
skips cleanly — the synthetic tier in test_integration.py remains the
always-on floor.

Recipe (also in README): put ``movie.mkv`` + ``movie.unsynced.srt`` +
``movie.synced.srt`` in a directory, write a ``cases.yaml`` after the
template, then::

    FFS_TPU_MEDIA_DIR=/path/to/media INTEGRATION=1 \
        python -m pytest tests/test_real_media.py -q
"""
import os

import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.sync import run

from tests.test_integration import timestamps_roughly_match

MEDIA_DIR = os.environ.get("FFS_TPU_MEDIA_DIR", "")
INTEGRATION = os.environ.get("INTEGRATION") == "1"


def _load_cases():
    """(case_id, argv_tail, truth_path, should_detect_encoding) tuples.

    Collection must never fail when the tier is inactive: an empty list
    parametrizes to zero tests and pytest reports the module as skipped
    via the guard test below.
    """
    if not (INTEGRATION and MEDIA_DIR and os.path.isdir(MEDIA_DIR)):
        return []
    import yaml

    config_path = os.path.join(MEDIA_DIR, "cases.yaml")
    if not os.path.exists(config_path):
        config_path = os.path.join(os.path.dirname(__file__), "real_media_cases.yaml")
    with open(config_path, "r") as f:
        config = yaml.safe_load(f)
    cases = []
    for i, test in enumerate(config.get("sync_tests") or []):
        if test.get("skip"):
            continue
        ref = os.path.join(MEDIA_DIR, test["ref"])
        unsynced = os.path.join(MEDIA_DIR, test["unsynced"])
        truth = os.path.join(MEDIA_DIR, test["synced"])
        argv = [ref, "-i", unsynced]
        for key, value in (test.get("extra_args") or {}).items():
            argv.extend(["--%s" % key, str(value)])
        for key in test.get("extra_no_value_args") or []:
            argv.append("--%s" % key)
        case_id = "%02d_%s" % (i, os.path.basename(test["ref"]))
        cases.append(
            (case_id, argv, truth, test.get("should_detect_encoding"))
        )
    return cases


_CASES = _load_cases()


@pytest.mark.skipif(
    bool(_CASES),
    reason="real-media cases active (see parametrized tests)",
)
def test_real_media_tier_gated():
    """Visible skip explaining how to activate the tier."""
    pytest.skip(
        "real-media tier inactive: set FFS_TPU_MEDIA_DIR to a media "
        "directory and INTEGRATION=1 (template: tests/real_media_cases.yaml)"
    )


@pytest.mark.parametrize(
    "case_id,argv,truth,should_detect_encoding",
    _CASES,
    ids=[c[0] for c in _CASES],
)
def test_real_media_sync_matches_ground_truth(
    case_id, argv, truth, should_detect_encoding, tmp_path
):
    for path in (argv[0], argv[2], truth):
        if not os.path.exists(path):
            pytest.skip("media file missing: %s" % path)
    out = os.path.join(
        str(tmp_path), "out" + os.path.splitext(argv[2])[-1]
    )
    args = make_parser().parse_args(argv + ["-o", out])
    result = run(args)
    assert result["retval"] == 0, "sync failed for %s" % case_id
    assert timestamps_roughly_match(out, truth), (
        "case %s: output disagrees with ground truth on >1%% of windows"
        % case_id
    )
    if should_detect_encoding is not None:
        from ffsubsync_tpu.subs.parser import SubtitleParser

        fmt = os.path.splitext(argv[2])[-1].lstrip(".") or "srt"
        parser = SubtitleParser(fmt=fmt, encoding="infer").fit(argv[2])
        assert parser.detected_encoding_ == should_detect_encoding
