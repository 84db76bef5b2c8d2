"""Network factories (capability parity with reference
``nnx_ppo/networks/factories.py:14-146``).

Keys replace the reference's ``nnx.Rngs`` plumbing: every factory takes
one JAX PRNG key and folds per-layer subkeys from it.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.networks.adapter import PPOAdapter
from nnx_ppo_tpu.networks.containers import Sequential
from nnx_ppo_tpu.networks.feedforward import Dense
from nnx_ppo_tpu.networks.normalizer import Normalizer
from nnx_ppo_tpu.networks.sampling_layers import NormalTanhSampler
from nnx_ppo_tpu.networks.types import StatefulModule

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


def make_mlp_layers(
    sizes: Sequence[int],
    key: jax.Array,
    activation: Callable = jax.nn.relu,
    activation_last_layer: bool = True,
    **dense_kwargs: Any,
) -> list[Dense]:
    """Create a list of Dense layers for an MLP.

    Args:
        sizes: Layer sizes including input and output.
        key: PRNG key; per-layer init keys are folded from it.
        activation: Activation between layers.
        activation_last_layer: Apply activation after the last layer.
        **dense_kwargs: Extra arguments for :meth:`Dense.create`
            (``kernel_init``, ``compute_dtype``, ``use_bias``).
    """
    layers = []
    for i, (din, dout) in enumerate(zip(sizes[:-1], sizes[1:])):
        is_last = i == len(sizes) - 2
        act = activation if (not is_last or activation_last_layer) else None
        layers.append(
            Dense.create(
                din, dout, jax.random.fold_in(key, i), activation=act, **dense_kwargs
            )
        )
    return layers


def make_mlp(
    sizes: Sequence[int],
    key: jax.Array,
    activation: Callable = jax.nn.relu,
    activation_last_layer: bool = True,
    **dense_kwargs: Any,
) -> Sequential:
    """An MLP as a Sequential of Dense layers."""
    return Sequential.create(
        make_mlp_layers(sizes, key, activation, activation_last_layer, **dense_kwargs)
    )


def make_mlp_actor_critic(
    obs_size: int,
    action_size: int,
    actor_hidden_sizes: Sequence[int],
    critic_hidden_sizes: Sequence[int],
    key: jax.Array,
    activation: Union[Callable, str] = jax.nn.relu,
    normalize_obs: bool = True,
    initializer_scale: float = 1.0,
    # Sampler arguments
    entropy_weight: float = 1e-2,
    min_std: float = 1e-1,
    std_scale: float = 1.0,
    compute_dtype: Any = None,
) -> StatefulModule:
    """Standard one-actor / one-critic PPO network.

    Pipeline (reference ``factories.py:92-100``)::

        Sequential([
            Normalizer(obs_size)?,        # if normalize_obs
            PPOAdapter(
                action=Sequential([actor_mlp..., NormalTanhSampler]),
                value=critic_mlp,
            ),
        ])

    The actor head outputs ``2 * action_size`` features (mean ‖ raw-std),
    the critic head outputs 1. Dense kernels use variance-scaling
    (fan-in, uniform) init. ``compute_dtype=jnp.bfloat16`` runs the
    Dense matmuls on the MXU in bf16 with f32 accumulation.
    """
    if isinstance(activation, str):
        activation = _ACTIVATIONS[activation]

    kernel_init = jax.nn.initializers.variance_scaling(
        initializer_scale, "fan_in", "uniform"
    )
    actor_key, critic_key, sampler_key = jax.random.split(key, 3)

    actor_layers = make_mlp_layers(
        [obs_size, *actor_hidden_sizes, action_size * 2],
        actor_key,
        activation,
        activation_last_layer=False,
        kernel_init=kernel_init,
        compute_dtype=compute_dtype,
    )
    critic = make_mlp(
        [obs_size, *critic_hidden_sizes, 1],
        critic_key,
        activation,
        activation_last_layer=False,
        kernel_init=kernel_init,
        compute_dtype=compute_dtype,
    )
    sampler = NormalTanhSampler.create(
        sampler_key,
        entropy_weight=entropy_weight,
        min_std=min_std,
        std_scale=std_scale,
    )
    adapter = PPOAdapter.create(
        action=Sequential.create([*actor_layers, sampler]),
        value=critic,
    )
    if normalize_obs:
        return Sequential.create([Normalizer.create(obs_size), adapter])
    return adapter
