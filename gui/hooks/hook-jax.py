# PyInstaller hook: jax ships version metadata and pure-python subpackages
# that the default analysis misses inside the frozen bundle (the analog of
# the reference's gui/hooks/hook-webrtcvad.py metadata hook for its native
# VAD dependency — here the compute dependency is jax).
from PyInstaller.utils.hooks import collect_submodules, copy_metadata

datas = copy_metadata("jax") + copy_metadata("jaxlib")
hiddenimports = collect_submodules("jax._src")
