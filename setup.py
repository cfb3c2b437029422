"""Package setup for mindpose_tpu (parity: /root/reference/setup.py)."""
import os

from setuptools import find_packages, setup


def _version() -> str:
    ns = {}
    with open(os.path.join("mindpose_tpu", "version.py")) as f:
        exec(f.read(), ns)
    return ns["__version__"]


setup(
    name="mindpose_tpu",
    version=_version(),
    description="TPU-native 2D human pose estimation framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "tests.*", "tools", "tools.*")),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "pyyaml",
        "opencv-python",
        "scipy",
    ],
    extras_require={"test": ["pytest"]},
)
