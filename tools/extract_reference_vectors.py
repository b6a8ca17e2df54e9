#!/usr/bin/env python3
"""Extract golden test data from the reference repo into JSON files.

Reads /root/reference (read-only) and writes tests/data/*.json. This extracts
*data* (constants, test vectors) — not code — per SURVEY.md Phase 0.
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data"
OUT.mkdir(parents=True, exist_ok=True)


def parse_u64_groups(text: str):
    """Find all from_u64s_le(&[ ... ]) limb groups -> list of ints."""
    groups = []
    for m in re.finditer(r"from_u64s_le\(&\[(.*?)\]\)", text, re.S):
        limbs = re.findall(r"0x[0-9a-fA-F_]+", m.group(1))
        assert len(limbs) == 4, limbs
        n = 0
        for i, l in enumerate(limbs):
            n |= int(l.replace("_", ""), 16) << (64 * i)
        groups.append(n)
    return groups


def extract_generators():
    text = (REF / "masp_primitives/src/constants.rs").read_text()
    # Order of appearance in the file: proof_generation_key,
    # note_commitment_randomness, nullifier_position,
    # value_commitment_randomness, spending_key, then 6 pedersen generators.
    nums = parse_u64_groups(text)
    assert len(nums) == 2 * (5 + 6), len(nums)
    names = [
        "proof_generation_key_generator",
        "note_commitment_randomness_generator",
        "nullifier_position_generator",
        "value_commitment_randomness_generator",
        "spending_key_generator",
    ]
    out = {}
    for i, name in enumerate(names):
        out[name] = {"u": hex(nums[2 * i]), "v": hex(nums[2 * i + 1])}
    peds = []
    for j in range(6):
        peds.append({"u": hex(nums[10 + 2 * j]), "v": hex(nums[10 + 2 * j + 1])})
    out["pedersen_hash_generators"] = peds
    (OUT / "generators.json").write_text(json.dumps(out, indent=1))
    print("generators.json:", len(out), "entries")


def extract_pedersen_vectors():
    text = (REF / "masp_primitives/src/test_vectors/pedersen_hash_vectors.rs").read_text()
    vectors = []
    pat = re.compile(
        r"TestVector\s*\{\s*personalization:\s*Personalization::(\w+)(?:\((\d+)\))?,"
        r"\s*input_bits:\s*vec!\[(.*?)\],\s*hash_u:\s*\"Scalar\(0x([0-9a-f]+)\)\","
        r"\s*hash_v:\s*\"Scalar\(0x([0-9a-f]+)\)\",",
        re.S,
    )
    for m in pat.finditer(text):
        kind, num, bits, hu, hv = m.groups()
        bits = [int(b) for b in re.findall(r"[01]", bits)]
        vectors.append(
            {
                "personalization": kind,
                "num": int(num) if num else None,
                "input_bits": bits,
                "hash_u": "0x" + hu,
                "hash_v": "0x" + hv,
            }
        )
    assert vectors, "no pedersen vectors parsed"
    (OUT / "pedersen_hash_vectors.json").write_text(json.dumps(vectors))
    print("pedersen_hash_vectors.json:", len(vectors), "vectors")


def extract_note_encryption_vectors():
    text = (REF / "masp_primitives/src/test_vectors/note_encryption.rs").read_text()
    vectors = []
    # Split on TestVector { ... } blocks
    blocks = re.split(r"TestVector\s*\{", text)[1:]
    for blk in blocks:
        # Fields are `name: [ 0xAB, ... ],` or `name: <int>,`
        fields = {}
        for fm in re.finditer(r"(\w+):\s*(\[(?:[^\[\]]*)\]|\d+)\s*,", blk, re.S):
            name, val = fm.group(1), fm.group(2)
            if val.startswith("["):
                bs = re.findall(r"0x([0-9a-fA-F]{2})", val)
                fields[name] = "".join(bs)
            else:
                fields[name] = int(val)
        # Skip the struct-definition block (its "fields" are type decls).
        if isinstance(fields.get("ovk"), str) and len(fields["ovk"]) == 64:
            vectors.append(fields)
    assert vectors, "no note encryption vectors parsed"
    (OUT / "note_encryption_vectors.json").write_text(json.dumps(vectors))
    print("note_encryption_vectors.json:", len(vectors), "vectors")
    if vectors:
        print("  fields:", sorted(vectors[0].keys()))




def extract_zip32_vectors():
    """ZIP-32 test vectors (zip32/sapling.rs:1372-2178, from
    zcash-test-vectors sapling_zip32.py with MASP personalizations):
    seed = bytes(range(32)); rows for [m, m/1, m/1/2h, m/1/2hv, m/1/2hv/3]."""
    src = (REF / "masp_primitives/src/zip32/sapling.rs").read_text()
    start = src.index("let test_vectors = vec![")
    block = src[start : src.index("];", start)]
    field_re = re.compile(
        r"(\w+):\s*(None|Some\(\s*\[(.*?)\]\s*\)|\[(.*?)\])\s*,\s*\n", re.S
    )
    vectors = []
    for part in block.split("TestVector {")[1:]:
        tv = {}
        for m in field_re.finditer(part):
            name, whole, someb, plainb = m.groups()
            if whole == "None":
                tv[name] = None
            else:
                body = someb if someb is not None else plainb
                vals = [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\b\d+\b", body)]
                tv[name] = bytes(vals).hex()
        vectors.append(tv)
    assert len(vectors) == 5 and all(len(v) == 23 for v in vectors)
    (OUT / "zip32_vectors.json").write_text(json.dumps(vectors, indent=1))


if __name__ == "__main__":
    extract_generators()
    extract_pedersen_vectors()
    extract_note_encryption_vectors()
    extract_zip32_vectors()
