"""Small host-side utilities.

Parity target: ``/root/reference/common/utils.py:44-47`` (``deterministic_random``).
The reference's ``wrap`` numpy<->torch bridge (``utils.py:12-42``) has no equivalent
here: JAX ops accept numpy arrays directly, so the bridge dissolves.
"""

from __future__ import annotations

import hashlib


def deterministic_random(min_value: int, max_value: int, data: str) -> int:
    """SHA-256-seeded deterministic integer in [min_value, max_value).

    Used to pick reproducible sub-sequences for ``--subset`` training, independent of
    any global RNG state.  Bit-parity with the reference implementation.
    """
    digest = hashlib.sha256(data.encode()).digest()
    raw_value = int.from_bytes(digest[:4], byteorder="little", signed=False)
    return int(raw_value / (2**32 - 1) * (max_value - min_value)) + min_value
