"""Brute-force the TestConstraintSystem::hash serialization layout.

The reference pins structure digests for the three circuits
(masp_proofs/src/circuit/sapling.rs:731-734, :1024-1027,
convert.rs:219-222). nam-bellperson's gadgets/test hash algorithm is
blake2s-256 over [n_inputs, n_aux, n_constraints] then per-LC term dumps;
the serialization details (endianness, term order, zero-term handling)
are not recoverable with certainty offline, so we synthesize our circuits
once and sweep every plausible variant looking for digest equality.

Run: python tools/structure_hash_hunt.py [spend|output|convert]
"""

import hashlib
import itertools
import sys
import time

sys.path.insert(0, ".")

import masp_tpu.ops.field_jax as F  # noqa: E402

# Exact pinned digests from the reference:
#   spend:   masp_proofs/src/circuit/sapling.rs:733 (and :926)
#   output:  masp_proofs/src/circuit/sapling.rs:1026
#   convert: masp_proofs/src/circuit/convert.rs:221
PINNED = {
    "spend": "34e4a634c80e4e4c6250e63b7855532e60b36d1371d4d7b1163218b69f09eb3d",
    "output": "93e445d7858e98c7138558df341f020aedfe75893535025587d64731e244276a",
    "convert": "f74b47ef6e59081548f81f5806bd15b1f4a65d2e57681e6db2b8db7eef2ff814",
}


def synthesize(which):
    import masp_tpu.r1cs.cs as csmod
    from masp_tpu.r1cs.cs import TestConstraintSystem

    csmod.TRACE_LC = True  # keep raw insertion logs for the veclog variant
    cs = TestConstraintSystem()
    if which == "spend":
        from masp_tpu.circuits.sapling import Spend

        Spend().synthesize(cs)
    elif which == "output":
        from masp_tpu.circuits.sapling import Output

        Output().synthesize(cs)
    else:
        from masp_tpu.circuits.convert import Convert

        Convert().synthesize(cs)
    return cs


def digest(cs, *, count_end, idx_end, coeff_end, order, drop_zero,
           count_pad=False):
    from masp_tpu.r1cs.cs import R

    h = hashlib.blake2s(digest_size=32)
    h.update(cs.num_inputs.to_bytes(8, count_end))
    h.update(cs.num_aux.to_bytes(8, count_end))
    h.update(len(cs.constraints).to_bytes(8, count_end))
    for a, b, c, _path in cs.constraints:
        for comb in (a, b, c):
            if order == "veclog":  # bellman Vec-LC: insertion order, dups kept
                items = list(comb.log)
            else:
                items = list(comb.terms.items())
            if drop_zero:
                items = [(v, k % R) for v, k in items if k % R != 0]
            if order == "split":  # inputs ascending, then aux ascending
                items.sort(key=lambda t: (t[0] % 2, t[0] // 2))
            elif order == "aux_first":  # aux ascending, then inputs
                items.sort(key=lambda t: (-(t[0] % 2), t[0] // 2))
            elif order == "interleaved":  # raw variable-id order
                items.sort(key=lambda t: t[0])
            # "insertion": dict order as built
            h.update(len(items).to_bytes(8, count_end))
            if count_pad:  # hypothetical h.update(&buf) over the 41B buffer
                h.update(bytes(33))
            for v, coeff in items:
                h.update(b"I" if v % 2 == 0 else b"A")
                h.update((v // 2).to_bytes(8, idx_end))
                h.update((coeff % R).to_bytes(32, coeff_end))
    return h.hexdigest()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "output"
    t0 = time.time()
    cs = synthesize(which)
    print(f"{which}: {len(cs.constraints)} constraints, "
          f"{cs.num_inputs} inputs, {cs.num_aux} aux "
          f"(synth {time.time()-t0:.1f}s)")
    target = PINNED[which]
    hits = []
    for count_end, idx_end, coeff_end, order, drop_zero, count_pad in (
        itertools.product(
            ("big", "little"), ("big", "little"), ("little", "big"),
            ("split", "aux_first", "interleaved", "insertion", "veclog"),
            (False, True), (False, True),
        )
    ):
        d = digest(cs, count_end=count_end, idx_end=idx_end,
                   coeff_end=coeff_end, order=order, drop_zero=drop_zero,
                   count_pad=count_pad)
        tag = (count_end, idx_end, coeff_end, order, drop_zero, count_pad)
        if d == target:
            hits.append(tag)
            print("MATCH:", tag, d)
        else:
            print("miss :", tag, d)
    if not hits:
        print("NO VARIANT MATCHED — divergence is in circuit content, "
              "not the serializer.")
    return 0 if hits else 1


if __name__ == "__main__":
    raise SystemExit(main())
