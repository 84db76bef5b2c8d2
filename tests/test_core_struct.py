"""Tests for the pytree-dataclass module core."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from nnx_ppo_tpu.core import struct
from nnx_ppo_tpu.core.struct import (
    combine,
    field,
    param_mask,
    partition,
    partition_params,
    pytree_dataclass,
    static_field,
    tree_set_attr,
    tree_where,
)


@pytree_dataclass
class Leaf:
    w: jax.Array
    stats: jax.Array = field(role="stats")
    name: str = static_field(default="leaf")


@pytree_dataclass
class Outer:
    child: Leaf
    extra: jax.Array
    flag: bool = static_field(default=False)


def make_outer():
    return Outer(
        child=Leaf(w=jnp.ones(3), stats=jnp.zeros(2)),
        extra=jnp.full(4, 2.0),
    )


class TestPytreeDataclass:
    def test_flatten_roundtrip(self):
        outer = make_outer()
        leaves, treedef = jax.tree.flatten(outer)
        assert len(leaves) == 3  # w, stats, extra
        rebuilt = jax.tree.unflatten(treedef, leaves)
        assert jnp.array_equal(rebuilt.child.w, outer.child.w)
        assert rebuilt.flag == outer.flag

    def test_static_fields_in_treedef(self):
        a = make_outer()
        b = dataclasses.replace(a, flag=True)
        assert jax.tree.structure(a) != jax.tree.structure(b)

    def test_replace(self):
        outer = make_outer()
        new = outer.replace(extra=jnp.zeros(4))
        assert jnp.array_equal(new.extra, jnp.zeros(4))
        assert new.child is outer.child

    def test_jit_through(self):
        outer = make_outer()

        @jax.jit
        def f(o):
            return o.child.w.sum() + o.extra.sum()

        assert float(f(outer)) == 3.0 + 8.0


class TestPartition:
    def test_param_mask_roles(self):
        outer = make_outer()
        mask = param_mask(outer)
        assert mask.child.w is True
        assert mask.child.stats is False
        assert mask.extra is True

    def test_partition_combine_roundtrip(self):
        outer = make_outer()
        params, rest = partition_params(outer)
        assert params.child.stats is None
        assert rest.child.w is None
        rebuilt = combine(params, rest)
        assert jnp.array_equal(rebuilt.child.stats, outer.child.stats)
        assert jnp.array_equal(rebuilt.child.w, outer.child.w)

    def test_grad_skips_stats(self):
        outer = make_outer()
        params, rest = partition_params(outer)

        def loss(p):
            m = combine(p, rest)
            return (m.child.w**2).sum() + (m.extra**2).sum()

        grads = jax.grad(loss)(params)
        assert grads.child.stats is None
        assert jnp.array_equal(grads.child.w, 2 * outer.child.w)

    def test_partition_generic_containers(self):
        tree = {"a": make_outer(), "b": (jnp.ones(2), make_outer())}
        params, rest = partition(tree, param_mask(tree))
        assert params["a"].child.stats is None
        assert params["b"][0] is not None
        assert jnp.array_equal(
            combine(params, rest)["b"][1].child.stats, jnp.zeros(2)
        )


class TestTreeSetAttr:
    def test_set_static_flag(self):
        outer = make_outer()
        flipped = tree_set_attr(outer, "flag", True)
        assert flipped.flag is True
        assert outer.flag is False  # functional

    def test_nested_in_dict(self):
        tree = {"x": make_outer()}
        flipped = tree_set_attr(tree, "flag", True)
        assert flipped["x"].flag is True

    def test_untouched_returns_same_object(self):
        outer = make_outer()
        same = tree_set_attr(outer, "nonexistent_field", True)
        assert same is outer


class TestTreeWhere:
    def test_batched_select(self):
        cond = jnp.array([True, False, True])
        a = {"x": jnp.ones((3, 2)), "y": jnp.zeros(3)}
        b = {"x": jnp.zeros((3, 2)), "y": jnp.ones(3)}
        out = tree_where(cond, a, b)
        assert jnp.array_equal(out["x"][:, 0], jnp.array([1.0, 0.0, 1.0]))
        assert jnp.array_equal(out["y"], jnp.array([0.0, 1.0, 0.0]))

    def test_unbatched_leaf_passthrough(self):
        cond = jnp.array([True, False])
        a = {"shared": jnp.ones(5), "batched": jnp.ones(2)}
        b = {"shared": jnp.zeros(5), "batched": jnp.zeros(2)}
        out = tree_where(cond, a, b)
        # 'shared' has wrong leading dim → passed through from on_true.
        assert jnp.array_equal(out["shared"], jnp.ones(5))
        assert jnp.array_equal(out["batched"], jnp.array([1.0, 0.0]))

    def test_key_leaves(self):
        cond = jnp.array([True, False])
        keys_a = jax.random.split(jax.random.key(0), 2)
        keys_b = jax.random.split(jax.random.key(1), 2)
        out = tree_where(cond, keys_a, keys_b)
        assert jnp.array_equal(
            jax.random.key_data(out),
            jnp.stack(
                [jax.random.key_data(keys_a[0]), jax.random.key_data(keys_b[1])]
            ),
        )
