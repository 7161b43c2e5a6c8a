"""The roofline tool's jaxpr op counter — the numbers behind the
published 'at the wall' claim — must count what the kernel actually
does: recurse through jit/while/cond, weight loop bodies, charge moved
values (not whole scratch refs)."""

import sys, os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_count_jaxpr_on_synthetic_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from roofline import count_jaxpr, find_pallas_jaxprs

    def kernel(x_ref, o_ref, scratch):
        v = x_ref[...]            # mem (1 vreg)
        v = v + 1                 # arith
        v = v ^ 3                 # arith
        scratch[0] = v            # mem

        def body(i):
            scratch[0] = scratch[0] + 1   # mem + arith + mem
            return i + 1

        # DYNAMIC loop (lax.while_loop): charged at the measured weight.
        # (A static fori_loop lowers to scan and is charged its static
        # trip count instead — also covered below.)
        jax.lax.while_loop(lambda i: i < x_ref[0, 0], body, 0)
        o_ref[...] = scratch[0]   # mem x2

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.int32)],
        interpret=True,
    )
    jx = jax.make_jaxpr(fn)(jnp.zeros((8, 128), jnp.int32))
    kj = find_pallas_jaxprs(jx.jaxpr)
    assert len(kj) == 1
    counts = count_jaxpr(getattr(kj[0], "jaxpr", kj[0]), [7.0])
    # loop body charged at the GIVEN weight, not the static trip count
    assert counts["arith"] == 2 + 7.0 * 1, counts
    # scratch get/swap charged 1 vreg (the moved (8,128) value), never
    # the whole scratch ref
    assert counts["mem"] <= 4 + 7.0 * 2
    assert counts["other"] == 0
