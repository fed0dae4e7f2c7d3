"""Single home for the "pin the JAX platform before any backend" trick.

This image's sitecustomize pre-imports jax and registers the exclusive
`axon` TPU PJRT plugin, overriding env `JAX_PLATFORMS` — so forcing CPU
(tests, CLI verification runs, preprocessing pool workers, the driver's
virtual-mesh dryrun) must go through ``jax.config`` BEFORE the first
backend is created.  Previously four divergent copies of this lived in
tests/conftest.py, __graft_entry__.py, core/cache.py and
script/gh_preprocess_videos.py; they all call here now.
"""

from __future__ import annotations

import os
from typing import Optional


def force_platform(platform: str, n_virtual_devices: Optional[int] = None) -> None:
    """Pin ``jax_platforms`` to ``platform`` (must run pre-backend-creation).

    ``n_virtual_devices``: for ``platform == "cpu"``, additionally ensure
    ``--xla_force_host_platform_device_count=N`` is present in XLA_FLAGS so a
    virtual N-device mesh is available (no-op if the flag is already set).
    """
    if n_virtual_devices is not None and platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", platform)


def honor_platform_request(env_var: str = "SYNCFUSION_PLATFORM") -> Optional[str]:
    """Apply a platform override requested via ``env_var`` (if any).

    Returns the platform that was forced, or None.  Lets any CLI be driven
    on CPU while the exclusive TPU tunnel is busy (CI, verification,
    parallel dev): ``SYNCFUSION_PLATFORM=cpu python script/...``.
    """
    platform = os.environ.get(env_var)
    if platform:
        force_platform(platform)
    return platform or None
