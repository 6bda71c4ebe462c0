"""Compat entry point for gpu_check.py: device availability report.

The reference prints cuda availability + device name (gpu_check.py:1-4);
the TPU-native equivalent reports the JAX backend and topology.
"""

import jax

print(jax.default_backend() != "cpu")
if jax.devices():
    print(0)
    print(jax.devices()[0].device_kind)
