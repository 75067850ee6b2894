#!/usr/bin/env bash
# Build the macOS GUI .app bundle (role parity: reference gui/build-macos.sh).
set -euo pipefail
cd "$(dirname "$0")"
python3 -m PyInstaller --clean -y --distpath ./dist/macos ffs_tpu_gui.spec
# Gooey's wx menus need a Contents directory at the bundle root even for
# the plain binary layout (reference carries the same workaround:
# github.com/chriskiehl/Gooey/issues/259)
mkdir -p ./dist/macos/Contents
echo "built: $(pwd)/dist/macos/ffs-tpu-gui.app"
