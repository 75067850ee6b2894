# -*- coding: utf-8 -*-
"""Version info.

The reference uses versioneer (ffsubsync/_version.py) for git-tag-derived
versions plus a GitHub release check (ffsubsync/version.py:43-57). Here the
version is a plain constant; ``make_version_tuple`` and ``update_available``
keep the same API surface for embedders.
"""
import logging
from typing import Optional, Tuple

logger = logging.getLogger(__name__)

__version__ = "0.1.0"


def get_version() -> str:
    return __version__


def make_version_tuple(vstr: Optional[str] = None) -> Tuple[int, ...]:
    if vstr is None:
        vstr = __version__
    if vstr[0] == "v":
        vstr = vstr[1:]
    components = []
    for component in vstr.split("+")[0].split("."):
        try:
            components.append(int(component))
        except ValueError:
            break
    return tuple(components)


def update_available() -> bool:
    """Check GitHub for a newer release; False on any failure (offline, etc.)."""
    try:
        import json
        import urllib.request

        resp = urllib.request.urlopen(
            "https://api.github.com/repos/smacke/ffsubsync/releases/latest",
            timeout=1,
        )
        latest_vstr = json.loads(resp.read().decode("utf-8"))["tag_name"]
    except Exception:
        return False
    try:
        return make_version_tuple(__version__) < make_version_tuple(latest_vstr)
    except Exception:
        return False
