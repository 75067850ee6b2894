# -*- coding: utf-8 -*-
from setuptools import find_packages, setup

from ffsubsync_tpu.constants import DESCRIPTION, LONG_DESCRIPTION, PROJECT_NAME
from ffsubsync_tpu.version import __version__

setup(
    name=PROJECT_NAME,
    version=__version__,
    description=DESCRIPTION,
    long_description=LONG_DESCRIPTION,
    packages=find_packages(exclude=("tests", "tests.*")),
    package_data={
        # trained neural-VAD weights ship with the package (one file per
        # analysis rate); without these --vad silero/fused degrades to a
        # random-init net with only a log warning
        "ffsubsync_tpu": ["models/weights/*.npz"],
    },
    python_requires=">=3.9",
    install_requires=[
        "jax",
        "numpy",
        "charset-normalizer",
    ],
    extras_require={
        "neural": ["flax", "optax"],
        "rich": ["rich"],
        "progress": ["tqdm"],
    },
    entry_points={
        "console_scripts": [
            "ffs=ffsubsync_tpu.sync:main",
            "subsync=ffsubsync_tpu.sync:main",
            "ffsubsync=ffsubsync_tpu.sync:main",
            "ffs-tpu=ffsubsync_tpu.sync:main",  # Docker/docs entry name
            "ffs-tpu-batch=ffsubsync_tpu.batch:main",
        ],
    },
    zip_safe=False,
)
