"""Test configuration: run everything on a virtual 8-device CPU backend.

This is the JAX-idiomatic fake-distributed test harness (SURVEY §4): forcing
``xla_force_host_platform_device_count=8`` lets the shard_map/pjit paths run
real collectives on one host with no TPU pod.  Env vars must be set before
jax initializes, hence this module-level block.
"""

import os

# Belt: env vars (effective when jax is not yet imported)...
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# ...and braces: this environment preloads jax via PYTHONPATH site hooks with
# JAX_PLATFORMS=axon (the TPU tunnel), so the env vars alone are too late.
# The config API works post-import as long as no backend has initialized.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def reference_masks():
    """A sample of real indentation masks from the reference dataset, used as
    oracle inputs for morphology/CC/geometry parity tests."""
    import cv2

    mask_dir = Path("/root/reference/data/masks")
    if not mask_dir.exists():
        pytest.skip("reference dataset not available")
    paths = sorted(mask_dir.glob("*.png"))[::37][:5]  # spread sample
    masks = []
    for p in paths:
        m = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
        if m is None:
            continue
        if m.ndim == 3:
            m = m[:, :, 0]
        masks.append((p.stem, (m > 0).astype(np.uint8)))
    assert masks
    return masks


@pytest.fixture(scope="session")
def reference_images():
    import cv2

    img_dir = Path("/root/reference/data/images")
    if not img_dir.exists():
        pytest.skip("reference dataset not available")
    paths = sorted(img_dir.glob("*"))
    paths = [p for p in paths if p.suffix.lower() in (".png", ".jpg")][::61][:3]
    out = []
    for p in paths:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is not None:
            out.append((p.stem, img))
    assert out
    return out
