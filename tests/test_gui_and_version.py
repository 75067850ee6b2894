# -*- coding: utf-8 -*-
"""GUI module importability/parser smoke test (with a stubbed Gooey) and
version-infrastructure checks."""
import argparse
import sys
import types

import pytest


def test_gui_imports_without_gooey(monkeypatch):
    monkeypatch.delitem(sys.modules, "gooey", raising=False)
    monkeypatch.delitem(sys.modules, "ffsubsync_tpu.gui", raising=False)
    import ffsubsync_tpu.gui as gui  # must not raise

    with pytest.raises(ImportError, match="gooey"):
        gui.make_parser()


class _WidgetlessGroup:
    def __init__(self, group):
        self._group = group

    def add_argument(self, *args, widget=None, **kwargs):
        return self._group.add_argument(*args, **kwargs)

    def __getattr__(self, name):  # argparse internals reach into groups
        return getattr(self._group, name)


class _FakeGooeyParser(argparse.ArgumentParser):
    def add_argument_group(self, *args, **kwargs):
        return _WidgetlessGroup(super().add_argument_group(*args, **kwargs))


def _install_fake_gooey(monkeypatch):
    fake = types.ModuleType("gooey")
    fake.Gooey = lambda *a, **kw: (lambda fn: fn)
    fake.GooeyParser = _FakeGooeyParser
    monkeypatch.setitem(sys.modules, "gooey", fake)


def test_gui_parser_construction_and_args(monkeypatch):
    _install_fake_gooey(monkeypatch)
    import ffsubsync_tpu.gui as gui

    parser = gui.make_parser()
    args = parser.parse_args(
        ["ref.mkv", "in.srt", "-o", "out.srt", "--vad", "fused"]
    )
    assert args.reference == "ref.mkv"
    assert args.srtin == "in.srt"
    assert args.srtout == "out.srt"
    assert args.vad == "fused"
    assert args.max_offset_seconds == 60


def test_version_is_pep440ish_and_tuple_parses():
    from ffsubsync_tpu.version import __version__, make_version_tuple

    assert make_version_tuple(__version__) >= (0, 2)
    assert make_version_tuple("v1.2.3") == (1, 2, 3)
    assert make_version_tuple("0.2.0.post3+gabc") == (0, 2, 0)


def test_update_check_targets_this_project_not_the_reference():
    from ffsubsync_tpu.version import RELEASE_API_URL

    # round-1 bug: checking smacke/ffsubsync's tags made a 0.x build always
    # report "Update available!"
    assert "smacke" not in RELEASE_API_URL


def test_update_available_false_when_offline(monkeypatch):
    import urllib.request

    def boom(*a, **kw):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    from ffsubsync_tpu.version import update_available

    assert update_available() is False


def test_update_available_compares_tags(monkeypatch):
    import json

    import ffsubsync_tpu.version as version_mod

    class FakeResp:
        def read(self):
            return json.dumps({"tag_name": "v999.0.0"}).encode()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", lambda *a, **kw: FakeResp())
    assert version_mod.update_available() is True
