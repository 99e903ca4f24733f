"""Build the lapha_native C++ extension:

    cd native && python setup.py build_ext --inplace

lapha_tpu/native.py also builds it on demand (first import) and falls back
to pure Python if no compiler is available.
"""

from setuptools import Extension, setup

setup(
    name="lapha_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "lapha_native",
            sources=["lapha_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
)
