"""Helper to import the read-only reference implementation for parity tests.

The reference tree (if mounted) is used purely as an *oracle*: we feed the
same inputs to both implementations and compare outputs.  Tests that need it
skip cleanly when the mount is absent.
"""

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "dl_scl_polar"))


def import_reference():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import dl_scl_polar  # noqa: F401
    import dl_scl_polar.polar.polar  # noqa: F401
    import dl_scl_polar.polar.scl  # noqa: F401
    import dl_scl_polar.polar.crc  # noqa: F401
    import dl_scl_polar.dlscl.beta  # noqa: F401
    import dl_scl_polar.dlscl.flip  # noqa: F401
    import dl_scl_polar.nr.polar.interleaver  # noqa: F401
    import dl_scl_polar.nr.polar.rate_match  # noqa: F401
    import dl_scl_polar.nr.polar.scl_nr  # noqa: F401
    import dl_scl_polar.nr.ldpc  # noqa: F401

    return dl_scl_polar
