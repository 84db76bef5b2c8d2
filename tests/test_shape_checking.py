"""The runtime shape-check mode (jaxtyping + typeguard import hook,
installed for the whole package by ``tests/conftest.py``) must reject
deliberately wrong-shaped calls — and only when the hook is active
(reference keeps the same fixture: ``nnx_ppo/conftest.py:10``)."""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import pytest

from nnx_ppo_tpu.ops.gae import gae_scan


def test_hook_is_active_in_suite():
    """conftest installed the import hook before the package was
    imported, so package modules carry the jaxtyping typechecker."""
    T, B = 4, 3
    rewards = jnp.zeros((T, B))
    values = jnp.zeros((T, B))
    done = jnp.zeros((T, B))
    # last_value deliberately [B+1] — shape-inconsistent with rewards.
    with pytest.raises(Exception, match="batch|type|shape"):
        gae_scan(rewards, values, jnp.zeros(B + 1), done, done, 0.95, 0.99)


def test_correct_shapes_pass():
    T, B = 4, 3
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    done = jnp.zeros((T, B))
    out = gae_scan(rewards, values, jnp.zeros(B), done, done, 0.95, 0.99)
    assert out.shape == (T, B)


def test_wrong_shape_passes_without_hook():
    """The same wrong-shaped call is NOT rejected when the package is
    imported without the hook — shape checking is a test-time mode, not
    a production overhead."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")  # env var alone is
        # not enough where site hooks force a tunneled-TPU platform
        import jax.numpy as jnp
        from nnx_ppo_tpu.ops.gae import gae_scan
        T, B = 4, 3
        z = jnp.zeros((T, B))
        # done/truncated [T, 1] broadcasts silently against [T, B] —
        # precisely the silent failure the hook exists to catch.
        try:
            gae_scan(z, z, jnp.zeros(B), jnp.zeros((T, 1)), jnp.zeros((T, 1)),
                     0.95, 0.99)
            print("NO_TYPE_ERROR")
        except Exception:
            print("TYPE_ERROR")
        """
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "NO_TYPE_ERROR" in result.stdout, result.stderr
