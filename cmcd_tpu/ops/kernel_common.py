"""Shared plumbing for the fused Pallas kernels.

Every kernel in ops/pallas_*.py hoists its traced-closure constants into
explicit kernel inputs (so nothing is baked into the compiled executable)
and sizes its scoped-VMEM request from its actual operands. These helpers
are that shared machinery.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def bf16_storage_leaf(t) -> bool:
    """Per-tensor predicate for bf16 weight STORAGE in the split reverse
    sweep (pallas_kl net_grads_outside): only matrices large enough to
    matter are cast; biases, small embeddings, and scalars stay f32. The
    VMEM gates in ops/fused size sn_eff with this SAME predicate so the
    estimate and the kernel cannot drift (a gate that assumed all bytes
    halve was optimistic for nets with substantial sub-threshold tensors).
    Works on both concrete arrays and jax.eval_shape ShapeDtypeStructs."""
    return getattr(t, "ndim", 0) >= 2 and getattr(t, "size", 0) > 4096


def normalize_time_block(nbridges: int, time_block: int) -> int:
    """Largest divisor of nbridges that is <= max(1, time_block).

    The ONE normalization rule shared by every time-chunked kernel: the
    forward rollout's stored-window chunking and the reverse sweep's
    chunk grid must agree on t_block or the window layouts desynchronize
    — both sides call this on the SAME requested time_block."""
    t_block = max(1, time_block)
    while nbridges % t_block != 0:
        t_block -= 1
    return t_block


def pack_consts(raw):
    """Lift jaxpr constants into VMEM-compatible arrays.

    0-d constants become (1, 1), 1-d become (1, n); float64 is demoted.
    Returns (shapes, arrays) where shapes tags how to undo the lift
    in-kernel (unpack_consts).
    """
    shapes, arrays = [], []
    for c in raw:
        c = jnp.asarray(c, jnp.float32 if c.dtype == jnp.float64 else c.dtype)
        if c.ndim == 0:
            c = c.reshape(1, 1)
            shapes.append(("scalar", c.shape))
        elif c.ndim == 1:
            c = c.reshape(1, -1)
            shapes.append(("vec", c.shape))
        else:
            shapes.append(("arr", c.shape))
        arrays.append(c)
    return shapes, arrays


def unpack_consts(shapes, refs):
    """Kernel-side inverse of pack_consts (refs -> original-rank values)."""
    vals = []
    for (kind, _), ref in zip(shapes, refs):
        v = ref[:]
        if kind == "scalar":
            v = v[0, 0]
        elif kind == "vec":
            v = v[0]
        vals.append(v)
    return vals


def vmem_limit_params(inputs, out_shape, extra_bytes: int = 0, interpret=False):
    """compiler_params kwargs sizing the scoped-VMEM limit to the kernel.

    v5e has ~128 MB physical VMEM but the compiler's scoped default is
    16 MB. 2x the operand footprint plus a 64 MB floor covers register
    spills and VJP temporaries that escape the operand estimate; this only
    raises the compiler's check, never allocations.

    Cap: 126 MiB (was 120). The whitened-LGCP eval kernel carries ~50 MiB
    of target constants (both orientations of the 1620^2 Cholesky factor
    for the score AND the value path) and needs 122.28 MiB of compiler
    stack (measured round 5) — 2 MiB over the old cap. 126 MiB keeps
    2 MiB of slack under the physical 128.
    """
    if interpret:
        return {}
    need = sum(math.prod(x.shape) * x.dtype.itemsize for x in inputs)
    need += sum(4 * math.prod(s.shape) for s in out_shape)
    need += extra_bytes
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(2 * need, 64 * 1024 * 1024), 126 * 1024 * 1024
            )
        )
    }
