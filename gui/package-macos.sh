#!/usr/bin/env bash
# Package the built .app into a drag-to-Applications .dmg installer
# (role parity: reference gui/package-macos.sh; `brew install create-dmg`).
set -Eeuxo pipefail
cd "$(dirname "$0")"

DIST=./dist/macos
BUILD=./build/dmg
VERSION=$(python3 -c "from ffsubsync_tpu.version import __version__; print(__version__)")
APP="ffs-tpu-gui.app"
TARGET="$DIST/ffsubsync-tpu-${VERSION}-mac-$(uname -m).dmg"

test -e "$BUILD" && rm -rf "$BUILD"
test -e "$TARGET" && rm -f "$TARGET"
mkdir -p "$BUILD"
cp -r "$DIST/$APP" "$BUILD"

create-dmg \
    --volname "ffsubsync-tpu installer" \
    --window-pos 300 200 \
    --window-size 700 500 \
    --icon-size 150 \
    --icon "$APP" 200 200 \
    --hide-extension "$APP" \
    --app-drop-link 450 200 \
    --no-internet-enable \
    "$TARGET" "$BUILD"
echo "packaged: $TARGET"
