"""Memory-usage accounting (the `memuse` crate's DynamicUsage equivalent).

The reference exposes ``memuse::DynamicUsage`` so batch consumers (e.g. a
wallet's trial-decryption scanner) can budget working-set size:
masp_primitives/src/sapling/note_encryption.rs:38-46,156-168 (prepared
ivks, SaplingDomain), transaction/components/sapling.rs:321-328
(OutputDescription = its proof's usage), plus ``impl_no_dynamic_usage``
for plain-value types (consensus.rs:23,152-255, transaction.rs:72).

Python analogue: ``dynamic_usage(obj)`` returns the bytes retained beyond
the object header — 0 for plain values (ints, fixed byte strings held by
value in Rust), recursive for containers — and
``dynamic_usage_bounds(obj)`` the (lower, upper) pair, upper ``None``
when unknown, matching the trait's contract.

TPU extension: proving/verification state lives in HBM, not host heap, so
``device_usage(*trees)`` accounts jax.Array buffer bytes (the 90 MB-class
proving queries, MSM bucket state, batch-proof pipelines), which is the
number that actually constrains batch sizes on a chip.
"""

from __future__ import annotations

__all__ = [
    "dynamic_usage", "dynamic_usage_bounds", "register", "device_usage",
]

_REGISTRY: dict[type, object] = {}


def register(cls):
    """Class decorator: use the class's own ``dynamic_usage`` method."""

    def deco(fn):
        _REGISTRY[cls] = fn
        return fn

    if not isinstance(cls, type):
        raise TypeError("register(cls) takes the type to account for")
    return deco


def dynamic_usage(obj) -> int:
    """Bytes of dynamically-held memory retained by ``obj``.

    Mirrors memuse semantics: by-value scalars cost 0; containers cost
    their element storage plus elements' own dynamic usage."""
    fn = _REGISTRY.get(type(obj))
    if fn is not None:
        return fn(obj)
    if obj is None or isinstance(obj, (int, float, bool)):
        return 0
    if isinstance(obj, (bytes, bytearray)):
        return len(obj)
    if isinstance(obj, str):
        return len(obj.encode())
    if isinstance(obj, (list, tuple, set, frozenset)):
        return 8 * len(obj) + sum(dynamic_usage(x) for x in obj)
    if isinstance(obj, dict):
        return 16 * len(obj) + sum(
            dynamic_usage(k) + dynamic_usage(v) for k, v in obj.items()
        )
    du = getattr(obj, "dynamic_usage", None)
    if callable(du):
        return du()
    # plain value object (dataclass-like): account its slots/dict fields
    fields = getattr(obj, "__slots__", None)
    if fields is not None:
        return sum(dynamic_usage(getattr(obj, f, None)) for f in fields)
    d = getattr(obj, "__dict__", None)
    if d is not None:
        return dynamic_usage(d)
    return 0


def dynamic_usage_bounds(obj) -> tuple[int, int | None]:
    """(lower, upper) bounds; exact for everything we account."""
    n = dynamic_usage(obj)
    return (n, n)


def device_usage(*objs) -> int:
    """Total bytes of unique device (HBM) buffers reachable from ``objs``.

    Accepts jax.Arrays, pytrees of them, and the prover's
    ``Parameters.device`` dicts; buffers are deduplicated by identity so
    shared queries are counted once."""
    import jax

    seen: set[int] = set()
    total = 0

    def visit(x):
        nonlocal total
        if isinstance(x, jax.Array):
            if id(x) not in seen:
                seen.add(id(x))
                total += x.nbytes
            return
        if isinstance(x, dict):
            for v in x.values():
                visit(v)
        elif isinstance(x, (list, tuple)):
            for v in x:
                visit(v)
        elif hasattr(x, "device") and isinstance(getattr(x, "device"), dict):
            visit(x.device)

    for o in objs:
        visit(o)
    return total
