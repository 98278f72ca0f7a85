from setuptools import find_packages, setup

setup(
    name="uemda_tpu",
    version="0.1.0",
    description=(
        "TPU-native JAX framework for uncertainty-aware domain-adaptive "
        "remote-sensing segmentation"
    ),
    packages=find_packages(include=["uemda_tpu", "uemda_tpu.*"]),
    python_requires=">=3.10",
)
