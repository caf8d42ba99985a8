"""Build integration: compile the native C++ runtime (libpie_runtime.so)
during pip install when a toolchain is present (reference parity: the
py-build-cmake backend drove pie_core's CMake from pip,
reference pyproject.toml:67-73). The native library is OPTIONAL — every
native component has a Python fallback (runtime/allocator.py loads it
lazily and builds on demand) — so a missing compiler degrades gracefully
instead of failing the install."""

import logging
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

log = logging.getLogger(__name__)


class BuildWithNative(build_py):
    def run(self):
        self._build_native()
        super().run()

    def _build_native(self):
        root = Path(__file__).parent
        native = root / "native"
        if not native.exists() or shutil.which("cmake") is None:
            log.warning("cmake or native/ missing; skipping native build")
            return
        build = native / "build"
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        try:
            subprocess.run(
                ["cmake", "-S", str(native), "-B", str(build),
                 "-DCMAKE_BUILD_TYPE=Release", *gen],
                check=True,
            )
            subprocess.run(
                ["cmake", "--build", str(build), "--parallel",
                 "--target", "pie_runtime"],
                check=True,
            )
        except subprocess.CalledProcessError as e:  # pragma: no cover
            log.warning("native build failed (%s); python fallbacks apply", e)


setup(cmdclass={"build_py": BuildWithNative})
