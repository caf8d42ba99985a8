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
        built = self._build_native()
        super().run()
        # Ship the shared library inside the wheel: the loader probes
        # pie_tpu/runtime/libpie_runtime.so before trying a source-tree
        # build (runtime/allocator.py:24-26). Without this copy a
        # non-editable install silently fell back to the Python
        # implementations (advisor finding, round 4).
        if built is not None and built.exists():
            dest = Path(self.build_lib) / "pie_tpu" / "runtime"
            dest.mkdir(parents=True, exist_ok=True)
            shutil.copy2(built, dest / built.name)

    def _build_native(self) -> Path | None:
        root = Path(__file__).parent
        native = root / "native"
        if not native.exists() or shutil.which("cmake") is None:
            log.warning("cmake or native/ missing; skipping native build")
            return None
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
            return None
        return build / "libpie_runtime.so"


setup(cmdclass={"build_py": BuildWithNative})
