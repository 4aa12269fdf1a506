"""Legacy capability surface: PAC codes, rate profiles, channels, OFDM.

Work-alikes of the reference's flat-script generation (`/root/reference/
polar_code.py`, `rate_profile.py`, `channel.py`, `crclib.py`,
`simulator.py`, `ofdm_channel_estimation.py`, `crc_polar_*.py`) rebuilt on
the TPU-native core: construction stays host-side NumPy, while PAC
encoding/list-decoding are batched JAX pipelines.
"""

from .exceptions import PCLengthError, PCLengthDivTwoError, PCInfoLengthError
from .rate_profile import rateprofile
from .crclib import crc
from .channel import channel

__all__ = [
    "PCLengthError",
    "PCLengthDivTwoError",
    "PCInfoLengthError",
    "rateprofile",
    "crc",
    "channel",
]
