#!/usr/bin/env bash
# Build the standalone Linux GUI binary (parity: reference gui/build-linux.sh).
set -euo pipefail
cd "$(dirname "$0")"
pyinstaller --clean --noconfirm ffs_tpu_gui.spec
echo "built: $(pwd)/dist/ffs-tpu-gui"
