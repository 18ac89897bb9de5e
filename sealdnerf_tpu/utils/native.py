"""Build/load the native C++ extensions (native/*.cpp).

Extensions are compiled on first use with the system g++ (pybind11 is not
in this image; they use the raw CPython + numpy C APIs). Each .so is
cached next to its source, keyed by source mtime.

  load_native(): native/mesher.cpp  -- marching tetrahedra + BVH SDF
  load_frames(): native/frames.cpp  -- GIL-releasing GUI-frame decode
"""

import importlib.util
import os
import subprocess
import sysconfig

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_modules = {}


def _load(name, src_name):
    if name in _modules:
        cached = _modules[name]
        if isinstance(cached, Exception):
            raise cached  # don't retry a failing g++ per call
        return cached
    try:
        so_path = os.path.abspath(os.path.join(_NATIVE_DIR, f"{name}.so"))
        src_path = os.path.abspath(os.path.join(_NATIVE_DIR, src_name))
        if not os.path.exists(so_path) or \
                os.path.getmtime(so_path) < os.path.getmtime(src_path):
            include_py = sysconfig.get_paths()["include"]
            include_np = np.get_include()
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                f"-I{include_py}", f"-I{include_np}",
                src_path, "-o", so_path,
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        spec = importlib.util.spec_from_file_location(name, so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:
        _modules[name] = e
        raise
    _modules[name] = mod
    return mod


def load_native():
    """Import the mesher extension, building it if needed."""
    return _load("_sealdnerf_native", "mesher.cpp")


def load_frames():
    """Import the frame-decode extension, building it if needed."""
    return _load("_sealdnerf_frames", "frames.cpp")
