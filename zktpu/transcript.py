"""Fiat-Shamir transcript, byte-exact with the reference.

Replicates /root/reference/fiat_shamir/src/fiat_shamir_transcript.rs:
  * ``append``  == ``hasher.update``  (:19-21)
  * ``get_random_challenge`` == ``finalize_reset()`` then re-append the 32-byte
    digest as the new state seed, then map to the field via
    ``from_le_bytes_mod_order`` (:23-29).

A streaming Keccak hasher that supports finalize-then-reset is equivalent to
hashing the concatenation of everything appended since the last reset, so the
transcript keeps a byte buffer and hashes it on each squeeze; after a squeeze
the buffer is replaced by the digest (= "reset, then append digest").

This byte protocol is the bit-exactness contract for the whole framework
(SURVEY.md section 2, item 4): every challenge in sumcheck/GKR is derived
through it.
"""

from __future__ import annotations

from .field.spec import FieldSpec
from .field.host import vec_to_bytes
from .hash.keccak import keccak256


class Transcript:
    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self._buf = bytearray()

    def append(self, preimage: bytes) -> None:
        self._buf += preimage

    def append_field_elements(self, values) -> None:
        """append(fq_vec_to_bytes(values)) -- the common call pattern."""
        self.append(vec_to_bytes(self.spec, values))

    def get_random_challenge(self) -> int:
        digest = keccak256(bytes(self._buf))
        self._buf = bytearray(digest)
        return self.spec.from_le_bytes_mod_order(digest)
