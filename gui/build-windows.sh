#!/usr/bin/env bash
# Build the Windows GUI .exe from a Linux host via the dockerized
# PyInstaller-for-Windows image (role parity: reference gui/build-windows.sh).
# On a native Windows runner, skip docker and run entrypoint-windows.sh
# (or just `pyinstaller ffs_tpu_gui.spec`) directly.
set -euo pipefail
cd "$(dirname "$0")"
nbits=${1:-64}
tag="python3"
if [[ "$nbits" == 32 ]]; then
    tag="${tag}-32bit"
fi
docker run -v "$(pwd):/src/" -v "$(pwd)/..:/ffsubsync_tpu/" \
    --entrypoint /bin/sh "cdrx/pyinstaller-windows:${tag}" \
    -c "pip install /ffsubsync_tpu && /ffsubsync_tpu/gui/entrypoint-windows.sh"
rm -rf "./dist/win${nbits}"
mv ./dist/windows "./dist/win${nbits}"
echo "built: $(pwd)/dist/win${nbits}"
