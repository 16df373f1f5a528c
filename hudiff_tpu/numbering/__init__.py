"""Host-side antibody numbering: AHo alignment + IMGT grid placement.

Prefers the external ANARCI package when importable (reference parity);
otherwise falls back to the built-in consensus-anchored Needleman-Wunsch
engine (numbering/align.py), which is self-consistent with the framework's
IMGT<->AHo scheme transfer.
"""
from . import aho, imgt  # noqa: F401
