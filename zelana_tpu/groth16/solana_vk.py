"""VK conversion to the on-chain (Solana) format + chunked upload layout.

Mirror of prover/src/bin/convert_vk.rs: arkworks VerifyingKey -> the
verifier program's account format -- G1 points as 64 bytes (x||y), G2 as
128 bytes (x.c0||x.c1||y.c0||y.c1), little-endian coordinate limbs
(convert_vk.rs:163-190) -- plus the chunked IC upload plan used by
scripts/store_vk.rs (init_batch_vk / append_ic_points / finalize, verifier
lib.rs:379-433, MAX_IC_POINTS=8).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List

from .keys import VerifyingKey

MAX_IC_POINTS = 8


def g1_to_solana(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return int(pt[0]).to_bytes(32, "little") + int(pt[1]).to_bytes(32, "little")


def g2_to_solana(pt) -> bytes:
    if pt is None:
        return b"\x00" * 128
    (x0, x1), (y0, y1) = pt
    return (
        int(x0).to_bytes(32, "little")
        + int(x1).to_bytes(32, "little")
        + int(y0).to_bytes(32, "little")
        + int(y1).to_bytes(32, "little")
    )


@dataclass
class SolanaVk:
    alpha_g1: bytes  # 64
    beta_g2: bytes  # 128
    gamma_g2: bytes  # 128
    delta_g2: bytes  # 128
    ic: List[bytes]  # 64 each

    def to_json(self) -> str:
        return json.dumps(
            {
                "alpha_g1": self.alpha_g1.hex(),
                "beta_g2": self.beta_g2.hex(),
                "gamma_g2": self.gamma_g2.hex(),
                "delta_g2": self.delta_g2.hex(),
                "ic": [p.hex() for p in self.ic],
            },
            indent=2,
        )


def convert_vk(vk: VerifyingKey) -> SolanaVk:
    assert len(vk.gamma_abc_g1) <= MAX_IC_POINTS, (
        f"verifier stores at most {MAX_IC_POINTS} IC points "
        f"({len(vk.gamma_abc_g1)} given)"
    )
    return SolanaVk(
        alpha_g1=g1_to_solana(vk.alpha_g1),
        beta_g2=g2_to_solana(vk.beta_g2),
        gamma_g2=g2_to_solana(vk.gamma_g2),
        delta_g2=g2_to_solana(vk.delta_g2),
        ic=[g1_to_solana(p) for p in vk.gamma_abc_g1],
    )


def upload_plan(svk: SolanaVk, domain: bytes = b"\x00" * 32,
                chunk: int = 4) -> List[dict]:
    """The store_vk.rs instruction sequence: init -> append IC in chunks ->
    finalize."""
    plan = [
        {
            "instruction": "init_batch_vk",
            "domain": domain.hex(),
            "alpha_g1": svk.alpha_g1.hex(),
            "beta_g2": svk.beta_g2.hex(),
            "gamma_g2": svk.gamma_g2.hex(),
            "delta_g2": svk.delta_g2.hex(),
        }
    ]
    for i in range(0, len(svk.ic), chunk):
        plan.append(
            {
                "instruction": "append_ic_points",
                "ic_points": [p.hex() for p in svk.ic[i : i + chunk]],
            }
        )
    plan.append({"instruction": "finalize_batch_vk"})
    return plan
