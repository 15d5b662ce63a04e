from setuptools import find_packages, setup

setup(
    name="umgen_tpu",
    version="0.1.0",
    description="TPU-native multimodal driving-scene world model framework",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
