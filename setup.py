from setuptools import find_packages, setup

setup(
    name="eyediseasesegmentation_tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas) framework for retinal fundus "
                 "lesion and vessel segmentation"),
    packages=find_packages(include=["eyediseasesegmentation_tpu",
                                    "eyediseasesegmentation_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "numpy", "pillow",
    ],
    extras_require={
        "analysis": ["matplotlib", "pandas", "scikit-learn", "opencv-python"],
        "test": ["pytest", "torch"],
    },
)
