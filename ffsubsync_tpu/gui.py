# -*- coding: utf-8 -*-
"""Gooey GUI frontend (parity: reference ffsubsync_gui.py:56-121).

Wraps the shared argument surface in Gooey widgets and runs the sync with
``gui_mode=True`` (which switches progress to stdout percent prints that
Gooey's ``progress_regex`` consumes). Gooey is an optional dependency: on
hosts without it this module raises a clear error at import.
"""
import logging
import sys

from ffsubsync_tpu.cli import add_main_args_for_cli
from ffsubsync_tpu.constants import (
    DEFAULT_MAX_OFFSET_SECONDS,
    DEFAULT_VAD,
    DESCRIPTION,
    PROJECT_NAME,
)
from ffsubsync_tpu.sync import run
from ffsubsync_tpu.version import get_version, update_available

logger = logging.getLogger(__name__)

try:
    from gooey import Gooey, GooeyParser
except ImportError as e:  # pragma: no cover - gooey is optional
    raise ImportError(
        "the GUI requires the optional 'gooey' dependency: pip install gooey"
    ) from e

_menu = [
    {
        "name": "File",
        "items": [
            {
                "type": "AboutDialog",
                "menuTitle": "About",
                "name": PROJECT_NAME,
                "description": DESCRIPTION,
                "version": get_version(),
            }
        ],
    }
]


@Gooey(
    program_name=PROJECT_NAME,
    image_dir=":ffsubsync_tpu",
    menu=_menu,
    tabbed_groups=True,
    progress_regex=r"(\d+)%",
    hide_progress_msg=True,
)
def make_parser():
    description = DESCRIPTION
    if update_available():
        description += "\nUpdate available! Please go to the website to update."
    parser = GooeyParser(description=description)
    main_group = parser.add_argument_group("Basic")
    main_group.add_argument(
        "reference",
        help="Reference video or subtitles to synchronize to.",
        widget="FileChooser",
    )
    main_group.add_argument(
        "srtin", help="Input subtitles to synchronize.", widget="FileChooser"
    )
    main_group.add_argument(
        "-o",
        "--srtout",
        help="Output subtitles file (default: <input>.synced.srt).",
        widget="FileSaver",
    )
    advanced_group = parser.add_argument_group("Advanced")
    advanced_group.add_argument(
        "--merge-with-reference",
        "--merge",
        action="store_true",
        help="Merge reference subtitles with synced output subtitles.",
    )
    advanced_group.add_argument(
        "--make-test-case",
        "--create-test-case",
        action="store_true",
        help="Create a test archive to attach to bug reports.",
    )
    advanced_group.add_argument(
        "--reference-stream",
        "--refstream",
        "--reference-track",
        "--reftrack",
        default=None,
        help="Which stream/track in the video file to use as reference "
        "(ffmpeg conventions, e.g. s:0 or a:3).",
    )
    advanced_group.add_argument(
        "--vad",
        choices=[
            "subs_then_webrtc",
            "webrtc",
            "subs_then_auditok",
            "auditok",
            "subs_then_silero",
            "silero",
            "fused",
        ],
        default=None,
        help="Voice activity detector to use (default={}).".format(DEFAULT_VAD),
    )
    advanced_group.add_argument(
        "--max-offset-seconds",
        type=float,
        default=DEFAULT_MAX_OFFSET_SECONDS,
        help="Maximum allowed offset seconds for any subtitle segment.",
    )
    return parser


def main() -> int:
    parser = make_parser()
    args = parser.parse_args()
    args.srtin = [args.srtin]
    args.gui_mode = True
    args.srtout = args.srtout or None
    # fill CLI-only defaults the GUI parser does not expose
    from ffsubsync_tpu.cli import make_parser as make_cli_parser

    defaults = vars(make_cli_parser().parse_args([args.reference]))
    for key, value in defaults.items():
        if not hasattr(args, key):
            setattr(args, key, value)
    return run(args)["retval"]


if __name__ == "__main__":
    sys.exit(main())
