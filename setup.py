"""Build hook: compile the native runtime library during packaging.

The consensus-aligner DP kernel and the record-store reader
(csrc/aligner.cc, csrc/recordstore.cc) build into
hudiff_tpu/native/libhudiff_native.so, loaded via ctypes at import time
with a pure-numpy fallback — so a failed native build degrades to the
slower path instead of breaking the install (mirrors how the loaders in
numbering/align.py and data/store.py treat a missing library).
All project metadata lives in pyproject.toml.
"""
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        try:
            subprocess.run(['make', '-C', 'csrc'], check=True)
        except Exception as e:  # noqa: BLE001 - fallback path exists
            print(f'hudiff-tpu: native build skipped ({e}); '
                  'pure-python fallbacks will be used')
        super().run()


setup(cmdclass={'build_py': build_py_with_native})
