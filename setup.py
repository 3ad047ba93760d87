"""Build glue for the native host data plane.

The C++ hostplane (native/hostplane.cpp) is a plain shared library consumed
through ctypes (passt_tpu/data/native.py) — it exports C symbols only, no
CPython module init. setuptools' build_ext is bent to produce an unadorned
``libhostplane.so`` inside the package so wheels/editable installs ship the
fast path without a separate ``make -C native`` step (which remains
supported for source checkouts; see native/Makefile).
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CTypesExtension(Extension):
    pass


class build_ctypes_ext(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CTypesExtension):
            return []  # no PyInit_* — ctypes library, not a Python module
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        # plain .so name (no ABI tag): passt_tpu.libhostplane ->
        # passt_tpu/libhostplane.so, the name native.py searches for
        ext = self.ext_map.get(ext_name)
        if isinstance(ext, CTypesExtension):
            return ext_name.replace(".", "/") + ".so"
        return super().get_ext_filename(ext_name)


setup(
    ext_modules=[
        CTypesExtension(
            "passt_tpu.libhostplane",
            sources=["native/hostplane.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fPIC", "-pthread"],
            extra_link_args=["-pthread"],
            libraries=["dl"],
        )
    ],
    cmdclass={"build_ext": build_ctypes_ext},
)
