# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Package build for sentencepiece-tpu.

The native host runtime (sentencepiece_tpu/native/native.cc) is built as a
plain shared library on first use (no pybind11 dependency — ctypes ABI);
installing with this setup simply ships the source and data assets.
"""

import os
import shutil

from setuptools import find_packages, setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    """Prebuild the native runtime at install time (the loader would
    otherwise build it lazily on first import); failure is non-fatal —
    every native entry point has a pure-Python fallback."""

    def run(self):
        super().run()
        try:
            import sentencepiece_tpu.native as native
            if native.available():
                src = native._so_path()
                dst_dir = os.path.join(self.build_lib,
                                       "sentencepiece_tpu", "native")
                if os.path.isdir(dst_dir) and os.path.exists(src):
                    shutil.copy2(src, dst_dir)
        except Exception as e:  # pragma: no cover
            print(f"warning: native prebuild skipped: {e}")


setup(
    cmdclass={"build_py": BuildPyWithNative},
    name="sentencepiece-tpu",
    version="0.1.82.dev0",
    description=("TPU-native SentencePiece: subword training and "
                 "tokenization as JAX/XLA array programs"),
    long_description=open("README.md", encoding="utf-8").read(),
    long_description_content_type="text/markdown",
    license="Apache-2.0",
    packages=find_packages(include=["sentencepiece_tpu",
                                    "sentencepiece_tpu.*"]),
    package_data={
        "sentencepiece_tpu": ["data/*.charsmap", "data/*.tsv",
                              "native/native.cc"],
    },
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
    entry_points={
        "console_scripts": [
            "spm_train=sentencepiece_tpu.cli.spm_train:main",
            "spm_encode=sentencepiece_tpu.cli.spm_encode:main",
            "spm_decode=sentencepiece_tpu.cli.spm_decode:main",
            "spm_normalize=sentencepiece_tpu.cli.spm_normalize:main",
            "spm_export_vocab=sentencepiece_tpu.cli.spm_export_vocab:main",
        ],
    },
)
