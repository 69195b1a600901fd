"""Groth16 key and proof containers + arkworks-compatible (de)serialization.

Byte layout matches ark-groth16 =0.5.0 `CanonicalSerialize` compressed mode,
which is the format of the reference's key files and golden artifacts
(prover/l2_vk.json, prover/l2_proof.json; written by prover/src/bin/keygen.rs
and prover/src/main.rs.bak export fns):

    VerifyingKey: alpha_g1(32) beta_g2(64) gamma_g2(64) delta_g2(64)
                  u64-LE len || gamma_abc_g1[len] (32 each)
    Proof:        a(32, G1) b(64, G2) c(32, G1)
    ProvingKey:   vk || beta_g1 delta_g1 || vec a_query || vec b_g1_query
                  || vec b_g2_query || vec h_query || vec l_query
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List

from ..curves import g1, g2


@dataclass
class VerifyingKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    gamma_abc_g1: List[tuple]

    def serialize_compressed(self) -> bytes:
        out = bytearray()
        out += g1.serialize_compressed(self.alpha_g1)
        out += g2.serialize_compressed(self.beta_g2)
        out += g2.serialize_compressed(self.gamma_g2)
        out += g2.serialize_compressed(self.delta_g2)
        out += struct.pack("<Q", len(self.gamma_abc_g1))
        for pt in self.gamma_abc_g1:
            out += g1.serialize_compressed(pt)
        return bytes(out)

    @classmethod
    def deserialize_compressed(cls, data: bytes) -> "VerifyingKey":
        off = 0
        alpha = g1.deserialize_compressed(data[off : off + 32]); off += 32
        beta = g2.deserialize_compressed(data[off : off + 64]); off += 64
        gamma = g2.deserialize_compressed(data[off : off + 64]); off += 64
        delta = g2.deserialize_compressed(data[off : off + 64]); off += 64
        (n,) = struct.unpack("<Q", data[off : off + 8]); off += 8
        ic = []
        for _ in range(n):
            ic.append(g1.deserialize_compressed(data[off : off + 32])); off += 32
        assert off == len(data), f"trailing bytes: {len(data) - off}"
        return cls(alpha, beta, gamma, delta, ic)


@dataclass
class Proof:
    a: tuple  # G1
    b: tuple  # G2
    c: tuple  # G1

    def serialize_compressed(self) -> bytes:
        return (
            g1.serialize_compressed(self.a)
            + g2.serialize_compressed(self.b)
            + g1.serialize_compressed(self.c)
        )

    @classmethod
    def deserialize_compressed(cls, data: bytes) -> "Proof":
        assert len(data) == 128
        return cls(
            g1.deserialize_compressed(data[0:32]),
            g2.deserialize_compressed(data[32:96]),
            g1.deserialize_compressed(data[96:128]),
        )


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: tuple
    delta_g1: tuple
    a_query: List[tuple] = field(default_factory=list)
    b_g1_query: List[tuple] = field(default_factory=list)
    b_g2_query: List[tuple] = field(default_factory=list)
    h_query: List[tuple] = field(default_factory=list)
    l_query: List[tuple] = field(default_factory=list)

    def serialize_compressed(self) -> bytes:
        out = bytearray()
        out += self.vk.serialize_compressed()
        out += g1.serialize_compressed(self.beta_g1)
        out += g1.serialize_compressed(self.delta_g1)
        for vec, ser in (
            (self.a_query, g1.serialize_compressed),
            (self.b_g1_query, g1.serialize_compressed),
            (self.b_g2_query, g2.serialize_compressed),
            (self.h_query, g1.serialize_compressed),
            (self.l_query, g1.serialize_compressed),
        ):
            out += struct.pack("<Q", len(vec))
            for pt in vec:
                out += ser(pt)
        return bytes(out)

    @classmethod
    def deserialize_compressed(cls, data: bytes) -> "ProvingKey":
        # VK first: parse field by field to find its extent
        off = 0
        alpha = g1.deserialize_compressed(data[off : off + 32]); off += 32
        beta2 = g2.deserialize_compressed(data[off : off + 64]); off += 64
        gamma2 = g2.deserialize_compressed(data[off : off + 64]); off += 64
        delta2 = g2.deserialize_compressed(data[off : off + 64]); off += 64
        (n,) = struct.unpack("<Q", data[off : off + 8]); off += 8
        ic = []
        for _ in range(n):
            ic.append(g1.deserialize_compressed(data[off : off + 32])); off += 32
        vk = VerifyingKey(alpha, beta2, gamma2, delta2, ic)
        beta_g1 = g1.deserialize_compressed(data[off : off + 32]); off += 32
        delta_g1 = g1.deserialize_compressed(data[off : off + 32]); off += 32

        def read_vec(off, size, deser):
            (m,) = struct.unpack("<Q", data[off : off + 8])
            off += 8
            vec = []
            for _ in range(m):
                vec.append(deser(data[off : off + size]))
                off += size
            return vec, off

        a_query, off = read_vec(off, 32, g1.deserialize_compressed)
        b_g1_query, off = read_vec(off, 32, g1.deserialize_compressed)
        b_g2_query, off = read_vec(off, 64, g2.deserialize_compressed)
        h_query, off = read_vec(off, 32, g1.deserialize_compressed)
        l_query, off = read_vec(off, 32, g1.deserialize_compressed)
        assert off == len(data)
        return cls(vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query, h_query, l_query)
