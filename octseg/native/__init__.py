"""Native (C++) runtime components, loaded via ctypes.

Build is lazy and cached: first import compiles the shared library with g++
into ``octseg/native/_build/``; later imports reuse it (rebuilds when the
source is newer than the binary). Every native entry point has a pure-Python
fallback, so the framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_THIS_DIR, '_build')
_LOCK = threading.Lock()
_LIBS: dict = {}

log = logging.getLogger(__name__)

_SOURCES = {
    'lzw': ['lzw.cc'],
    'dataloader': ['dataloader.cc', 'lzw.cc'],
    'h264enc': ['h264enc.cc'],
    'unpack': ['unpack.cc'],
}

_EXTRA_LINK = {
    'dataloader': ['-lz', '-pthread'],
}

_CXXFLAGS = ['-O3', '-march=native', '-fPIC', '-shared', '-std=c++17', '-Wall']


def load_library(name: str):
    """Compile (if needed) and dlopen the named native library, or None."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        sources = [os.path.join(_THIS_DIR, s) for s in _SOURCES[name]]
        if not all(os.path.exists(s) for s in sources):
            _LIBS[name] = None
            return None
        so_path = os.path.join(_BUILD_DIR, f'lib{name}.so')
        try:
            needs_build = not os.path.exists(so_path) or any(
                os.path.getmtime(s) > os.path.getmtime(so_path) for s in sources
            )
            if needs_build:
                os.makedirs(_BUILD_DIR, exist_ok=True)
                cmd = ['g++', *_CXXFLAGS, '-o', so_path, *sources]
                cmd += _EXTRA_LINK.get(name, [])
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            _LIBS[name] = ctypes.CDLL(so_path)
        except (OSError, subprocess.CalledProcessError) as e:
            detail = getattr(e, 'stderr', '') or str(e)
            log.warning('native %s unavailable, using Python fallback: %s', name, detail)
            _LIBS[name] = None
        return _LIBS[name]
