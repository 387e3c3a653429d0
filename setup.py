"""Build the native C loader extension at install time.

The runtime keeps its build-on-first-import fallback (sdtpu/native/__init__.py)
so editable/source checkouts work without this step; installing via pip just
front-loads the compile.
"""
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native extension."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # missing toolchain → numpy fallback at runtime
            print(f"warning: skipping native extension build ({e})")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"warning: skipping {ext.name} ({e})")


setup(
    ext_modules=[
        Extension(
            "sdtpu.native._sdtpu_native",
            sources=["sdtpu/native/dequant.c"],
            extra_compile_args=["-O3", "-pthread"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
