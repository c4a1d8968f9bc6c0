"""Fused log-domain Sinkhorn as a single Pallas TPU kernel.

Motivation: XLA's ``lax.while_loop`` Sinkhorn re-reads the cost matrix
from HBM twice per iteration (f-sweep + g-sweep) — for the FOT feature
problem (2048 x 2048 fp32 = 16 MB) that is ~32 MB of HBM traffic per
iteration. This kernel loads the cost into VMEM ONCE (bf16 storage, 8 MB)
and runs every iteration from on-chip memory with fp32 logsumexp
accumulators:

  * f-sweep: per row-block logsumexp over columns (block temps sized to
    stay well under the VMEM budget);
  * g-sweep: streaming logsumexp over row blocks (running max + rescaled
    running sum), so the column reduction is one pass;
  * the plan exp((f + g - C)/eps) is written block-wise at the end.

Dual potentials live lane-major as (1, n)/(1, m) rows (the TPU lane width
is 128; a (n, 1) column layout would waste a full sublane tile per
element). The iteration count is static (no data-dependent exit) —
callers pick it from the convergence behaviour of the pure-JAX solver
(the FOT problem converges in <10 iterations at the reference thresholds;
the default 64 is a comfortable margin).

MEASURED (v5e, 2048x2048, 64 iterations, chained timing): this kernel
runs at 70.7 ms vs 3.3 ms for the jitted lax.while_loop solver — XLA
already keeps the cost VMEM-resident across the fused loop body, so the
kernel's save-HBM-traffic premise doesn't bind at this shape, and its
block-serial sweeps lose to XLA's full-matrix schedules. Kept as a
correct alternative backend (plans agree to ~2e-7) and as the substrate
for a future multi-problem grid variant; the production solver remains
ops.sinkhorn.

Size limit: the bf16 cost must fit VMEM alongside one fp32 row block —
up to 2048 x 2048 with the default block_rows=256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(cost_ref, logp_ref, logq_ref, out_ref, f_ref, g_ref,
            out_block_ref, dma_sem,
            *, eps: float, n_iters: int, block_rows: int):
    n, m = cost_ref.shape
    n_blocks = n // block_rows
    inv_eps = 1.0 / eps

    def row_block(rb):
        return cost_ref[pl.ds(rb * block_rows, block_rows), :].astype(
            jnp.float32
        )

    def f_sweep():
        g = g_ref[:, :]  # (1, m)

        def body(rb, _):
            block = row_block(rb)
            t = (g - block) * inv_eps  # (BR, m)
            t_max = jnp.max(t, axis=1, keepdims=True)  # (BR, 1)
            lse = t_max + jnp.log(
                jnp.sum(jnp.exp(t - t_max), axis=1, keepdims=True)
            )
            logp = logp_ref[:, pl.ds(rb * block_rows, block_rows)]  # (1, BR)
            f_ref[:, pl.ds(rb * block_rows, block_rows)] = eps * (
                logp - lse.reshape(1, block_rows)
            )
            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

    def g_sweep():
        def body(rb, carry):
            run_max, run_sum = carry
            block = row_block(rb)
            f_block = f_ref[:, pl.ds(rb * block_rows, block_rows)]  # (1, BR)
            t = (f_block.reshape(block_rows, 1) - block) * inv_eps  # (BR, m)
            b_max = jnp.max(t, axis=0, keepdims=True)  # (1, m)
            new_max = jnp.maximum(run_max, b_max)
            run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.sum(
                jnp.exp(t - new_max), axis=0, keepdims=True
            )
            return new_max, run_sum

        init = (
            jnp.full((1, m), _NEG_INF, jnp.float32),
            jnp.zeros((1, m), jnp.float32),
        )
        run_max, run_sum = jax.lax.fori_loop(0, n_blocks, body, init)
        lse = run_max + jnp.log(run_sum)
        g_ref[:, :] = eps * (logq_ref[:, :] - lse)

    def iteration(_, carry):
        f_sweep()
        g_sweep()
        return carry

    g_ref[:, :] = jnp.zeros((1, m), jnp.float32)
    jax.lax.fori_loop(0, n_iters, iteration, 0)

    # The fp32 plan is too large for VMEM alongside the cost; stage each
    # block in VMEM and DMA it out to the HBM-resident output.
    def emit(rb, _):
        block = row_block(rb)
        f_block = f_ref[:, pl.ds(rb * block_rows, block_rows)]
        out_block_ref[:, :] = jnp.exp(
            (f_block.reshape(block_rows, 1) + g_ref[:, :] - block) * inv_eps
        )
        copy = pltpu.make_async_copy(
            out_block_ref,
            out_ref.at[pl.ds(rb * block_rows, block_rows), :],
            dma_sem,
        )
        copy.start()
        copy.wait()
        return 0

    jax.lax.fori_loop(0, n_blocks, emit, 0)


@functools.partial(
    jax.jit,
    static_argnames=("epsilon", "n_iters", "block_rows", "interpret"),
)
def sinkhorn_pallas(
    cost: jnp.ndarray,
    p: jnp.ndarray | None = None,
    q: jnp.ndarray | None = None,
    *,
    epsilon: float = 5e-3,
    n_iters: int = 64,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Entropic OT plan via the fused VMEM-resident kernel.

    ``cost`` (n, m) with n divisible by ``block_rows`` and m a multiple of
    128 (lane width); ``epsilon`` is relative to the max cost (scaled
    here, matching ops.sinkhorn(scale_cost=True)). Returns the (n, m)
    fp32 plan.
    """
    cost = jax.lax.stop_gradient(jnp.asarray(cost, jnp.float32))
    n, m = cost.shape
    if n % block_rows:
        raise ValueError(
            f"n={n} must be a multiple of block_rows={block_rows}")
    if m % 128:
        raise ValueError(f"m={m} must be a multiple of 128")

    cost = cost / jnp.maximum(jnp.max(cost), 1e-12)
    if p is None:
        p = jnp.full((n,), 1.0 / n, jnp.float32)
    if q is None:
        q = jnp.full((m,), 1.0 / m, jnp.float32)
    log_p = jnp.log(jnp.maximum(p, 1e-38)).reshape(1, n)
    log_q = jnp.log(jnp.maximum(q, 1e-38)).reshape(1, m)

    kernel = functools.partial(
        _kernel, eps=float(epsilon), n_iters=int(n_iters),
        block_rows=int(block_rows),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cost (bf16)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # log_p (1, n)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # log_q (1, m)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),           # f
            pltpu.VMEM((1, m), jnp.float32),           # g
            pltpu.VMEM((block_rows, m), jnp.float32),  # staged out block
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(cost.astype(jnp.bfloat16), log_p, log_q)
