#!/bin/bash
# In-container (wine) build steps for the dockerized Windows PyInstaller
# image (role parity: reference gui/entrypoint-windows.sh). Also usable on a
# native Windows runner under bash (git-bash / msys).
set -e

# the docker image sources wine's python via .bashrc; harmless elsewhere
[ -f /root/.bashrc ] && . /root/.bashrc

# CI pipelines that drive docker themselves can point this elsewhere
WORKDIR=${SRCDIR:-/src}
cd "$WORKDIR"

pip install pyinstaller gooey

if [[ "$*" == "" ]]; then
    pyinstaller --clean -y --distpath ./dist/windows --workpath /tmp ffs_tpu_gui.spec
    # restore host ownership of artifacts written from the container
    chown -R --reference=. ./dist/windows 2>/dev/null || true
else
    sh -c "$*"
fi
