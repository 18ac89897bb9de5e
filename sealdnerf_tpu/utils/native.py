"""Build/load the native C++ extension (native/mesher.cpp).

The extension is compiled on first use with the system g++ (pybind11 is not
in this image; the extension uses the raw CPython + numpy C APIs). The .so is
cached next to the source, keyed by source mtime.
"""

import importlib.util
import os
import subprocess
import sysconfig

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "_sealdnerf_native.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "mesher.cpp"))

_module = None


def _needs_build():
    if not os.path.exists(_SO_PATH):
        return True
    return os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)


def _build():
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        _SRC_PATH, "-o", _SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_native():
    """Import the compiled extension, building it if needed."""
    global _module
    if _module is not None:
        return _module
    if _needs_build():
        _build()
    spec = importlib.util.spec_from_file_location("_sealdnerf_native", _SO_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _module = mod
    return mod
