"""Build script: compiles the native SNP codec alongside the package.

The codec (adelie_tpu/src/snpio.cpp — the reference's .snpdat chunked
encoding, see io.py) is a plain C-ABI shared library driven via ctypes;
no pybind11 required.  If the build-time compile is skipped (no g++), the
runtime builds it lazily on first use (adelie_tpu/io.py _build_lib).
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BinaryDistribution(Distribution):
    """Force a platform-tagged wheel: the package ships a host-compiled
    _snpio.so (no declared ext_modules, so setuptools would otherwise tag
    the wheel py3-none-any and pip would install a linux .so anywhere;
    io.py rebuilds from source if the shipped one fails to load, but the
    honest tag prevents the mismatch in the first place)."""

    def has_ext_modules(self):
        return True


class BuildWithCodec(build_py):
    def run(self):
        super().run()
        src = Path(__file__).parent / "adelie_tpu" / "src" / "snpio.cpp"
        for base in [Path(self.build_lib), Path(__file__).parent]:
            out = base / "adelie_tpu" / "_snpio.so"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     str(src), "-o", str(out)],
                    check=True, capture_output=True,
                )
            except Exception:
                pass  # lazily built at runtime instead


setup(cmdclass={"build_py": BuildWithCodec},
      distclass=BinaryDistribution)
