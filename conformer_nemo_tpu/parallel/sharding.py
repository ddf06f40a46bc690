"""Parameter sharding rules: tensor-parallel encoder over the 'model' axis.

Replaces the role of Megatron TP in the reference's NLP stack (SURVEY.md
§2.7: apex parallel_state; absent in the ASR path) the TPU way: instead of
hand-written row/column-parallel layers with explicit all-reduces, we assign
`PartitionSpec`s to existing parameters by path — XLA's SPMD partitioner
splits the matmuls and inserts the collectives over ICI.

Rules (megatron-style column->row pairing so each block needs one
all-reduce):
  * FF: linear1 kernel [D, d_ff] -> (None, 'model'); linear2 [d_ff, D] ->
    ('model', None)
  * MHA: q/k/v/pos kernels [D, H*dk] -> (None, 'model') (head-sharded);
    linear_out [H*dk, D] -> ('model', None)
  * conv pointwise_conv1 [D, 2D] -> (None, 'model'); pointwise_conv2
    [D, D] -> ('model', None); depthwise kernel [k, 1, D] -> channel-sharded
    (None, None, 'model') with its bias.
  * everything else replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"linear1", "linear_q", "linear_k", "linear_v", "linear_pos", "pointwise_conv1"}
_ROW = {"linear2", "linear_out", "pointwise_conv2"}


def _spec_for_path(path: tuple, leaf) -> P:
    names = [str(getattr(p, "key", p)) for p in path]
    ndim = getattr(leaf, "ndim", 0)
    parent = names[-2] if len(names) >= 2 else ""
    leaf_name = names[-1]
    if parent in _COL and leaf_name == "kernel" and ndim == 2:
        return P(None, "model")
    if parent in _COL and leaf_name == "bias" and ndim == 1:
        return P("model")
    if parent in _ROW and leaf_name == "kernel" and ndim == 2:
        return P("model", None)
    # row-parallel bias stays replicated (added after the all-reduce)
    if leaf_name == "linear_pos_kernel" and ndim == 2:
        # rel-pos projection [D, H*dk]: head-sharded like q/k/v
        return P(None, "model")
    if leaf_name == "depthwise_kernel" and ndim == 3:
        return P(None, None, "model")
    if leaf_name == "depthwise_bias" and ndim == 1:
        return P("model")
    return P()


def params_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings matching `params`' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)), params
    )


def state_shardings(mesh: Mesh, state):
    """Shardings for a TrainState: params + matching optimizer moments; the
    rest replicated."""
    rep = NamedSharding(mesh, P())
    p_sh = params_shardings(mesh, state.params)

    def opt_state_sharding(os_node):
        # optax states hold pytrees with the same structure as params (mu, nu)
        import optax

        if hasattr(os_node, "mu") and hasattr(os_node, "nu"):
            return os_node._replace(
                count=rep,
                mu=params_shardings(mesh, os_node.mu),
                nu=params_shardings(mesh, os_node.nu),
            )
        return jax.tree.map(lambda _: rep, os_node)

    import optax

    opt_sh = jax.tree.map(
        opt_state_sharding,
        state.opt_state,
        is_leaf=lambda n: hasattr(n, "mu") and hasattr(n, "nu"),
    )
    return state.replace(
        step=rep,
        params=p_sh,
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=opt_sh,
        rng=rep,
    )


def shard_state(mesh: Mesh, state):
    """device_put the state with TP shardings applied."""
    sh = state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, sh)
