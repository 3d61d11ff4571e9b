"""Plan persistence — FFTW-wisdom-style save/load of :class:`BinnedPlan`.

Plans are pure data (sorted point→tile assignment plus static geometry,
``ops/binned.py:BinnedPlan``), built once per point set and reused across
every transform — the reference has no analogue because its CUDA kernels
re-derive shifts/psi on every call (``core_cuda.cu:192-204``), but here plan
construction is an O(n log n) sort (seconds at tens of millions of points),
so persisting plans across processes is the natural equivalent of FFTW
wisdom.

Format: a single ``.npz`` file holding the pytree leaves under their field
names plus a JSON header (``__meta__``) with the format version and the
static aux fields. The host-side ``order``/``row_start`` layout arrays are
saved when present (they let :func:`torch_nfft_tpu.ops.plan_stack` re-shard
a loaded plan without re-sorting) and restored as NumPy, matching their
in-memory convention.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .binned import BinnedPlan, _count_row_groups

__all__ = ["save_plan", "load_plan"]

# v2: the (n,) inv_slot leaf became the (S*K,) fill_keys permutation (its
# head is inv_slot; the tail lists the padding slots) — see BinnedPlan.
_FORMAT_VERSION = 2

# (field, required) — the pytree leaves of BinnedPlan in constructor order.
_ARRAY_FIELDS = (
    "slot_pt",
    "slot_pos",
    "origin",
    "row_batch",
    "fill_keys",
    "row_count",
)
_HOST_FIELDS = ("order", "row_start")


def save_plan(path, plan: BinnedPlan) -> None:
    """Serialize ``plan`` to ``path`` (a ``.npz`` file or file-like object).

    Device arrays are pulled to the host; loading puts them back on the
    default device lazily (first use under jit).
    """
    if not isinstance(plan, BinnedPlan):
        raise TypeError(f"save_plan expects a BinnedPlan, got {type(plan)!r}")
    meta = {
        "format_version": _FORMAT_VERSION,
        "n": plan.n,
        "dim": plan.dim,
        "N": plan.N,
        "m": plan.m,
        "sigma": plan.sigma,
        "T": plan.T,
        "K": plan.K,
        "batch_size": plan.batch_size,
        "pos_fp": plan.pos_fp,
        "window": plan.window,
        "active": plan.active,
        "S_occ": plan.S_occ,
    }
    arrays = {name: np.asarray(getattr(plan, name)) for name in _ARRAY_FIELDS}
    for name in _HOST_FIELDS:
        val = getattr(plan, name)
        if val is not None:
            arrays[name] = np.asarray(val)
    bt = plan.benes
    if bt is not None and getattr(bt, "pair_bits", None) is not None:
        # routed Benes permutation masks: persist the router's minimal
        # per-pair bit packing (~n bits/stage) so a loaded plan skips the
        # sequential host routing; the device word layout is re-expanded
        # on load. Tables built by the small-n NumPy router carry no
        # pair_bits and are simply rebuilt via with_benes_tables().
        arrays["benes_bits"] = np.asarray(bt.pair_bits)
        meta["benes"] = {"n": bt.n, "b": bt.b,
                         "compact": bool(getattr(bt, "compact", False))}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_plan(path) -> BinnedPlan:
    """Load a plan saved by :func:`save_plan`.

    The loaded plan carries the saved ``pos_fp`` fingerprint, so the loud
    plan-mismatch checks in ``ops/nfft.py`` still catch use against a point
    set that bins differently from the one the plan was built on.
    """
    with np.load(path) as data:
        if "__meta__" not in data:
            raise ValueError(f"{path!r} is not a torch_nfft_tpu plan file")
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode("utf-8"))
        version = meta.get("format_version")
        if version not in (1, _FORMAT_VERSION):
            raise ValueError(
                "Unsupported plan format version "
                f"{version!r} (expected {_FORMAT_VERSION}); "
                "re-save the plan with this version of torch_nfft_tpu"
            )
        raw = {name: np.asarray(data[name])
               for name in data.files if name != "__meta__"}
        if version == 1:
            # v1 stored inv_slot (n,); rebuild the full fill permutation by
            # appending the padding-slot ids (k >= row_count[s]).
            S, K = raw["slot_pt"].shape
            k_ar = np.arange(K, dtype=np.int32)[None, :]
            invalid = (k_ar >= raw["row_count"][:, None]).reshape(-1)
            flat_ids = np.arange(S * K, dtype=np.int32)
            raw["fill_keys"] = np.concatenate(
                [raw.pop("inv_slot").astype(np.int32), flat_ids[invalid]]
            )
        leaves = {name: jnp.asarray(raw[name]) for name in _ARRAY_FIELDS}
        host = {
            name: (raw[name] if name in raw else None)
            for name in _HOST_FIELDS
        }
    active = meta["active"]
    if active is not None:
        # JSON flattens the ((start, num), ...) per-axis tuples into lists.
        active = tuple(tuple(int(v) for v in pair) for pair in active)
    benes = None
    if "benes_bits" in raw:
        from .pallas.benes import tables_from_pair_bits

        bmeta = meta["benes"]
        benes = tables_from_pair_bits(
            raw["benes_bits"], int(bmeta["n"]), block_log2=int(bmeta["b"]),
            compact=bool(bmeta.get("compact", False)),
        )
    return BinnedPlan(
        **leaves,
        n=int(meta["n"]),
        dim=int(meta["dim"]),
        N=int(meta["N"]),
        m=int(meta["m"]),
        sigma=float(meta["sigma"]),
        T=int(meta["T"]),
        K=int(meta["K"]),
        batch_size=(
            None if meta["batch_size"] is None else int(meta["batch_size"])
        ),
        pos_fp=(None if meta["pos_fp"] is None else int(meta["pos_fp"])),
        window=str(meta["window"]),
        active=active,
        order=host["order"],
        row_start=host["row_start"],
        benes=benes,
        # files predating S_occ recompute it from the row tables (cheap,
        # host-side) so loaded plans keep the row-batched engine
        S_occ=(
            int(meta["S_occ"])
            if meta.get("S_occ") is not None
            else _count_row_groups(
                np.asarray(raw["origin"]), np.asarray(raw["row_batch"]),
                np.asarray(raw["row_count"]),
            )
        ),
    )
