"""Jittable associative-embedding grouping (on-device decode path).

The reference groups candidates on host with a growing dict + scipy Hungarian
per joint (/root/reference/mindpose/utils/match.py:14-116) — inherently
sequential and host-bound (HOT LOOP #3 in SURVEY.md §3). This version keeps
the same greedy-by-joint structure but with **fixed-capacity dense state**
([max_num] groups) and a jittable assignment, so whole-batch grouping runs
under jit/vmap on TPU.

Assignment note: scipy's Hungarian is replaced by iterated global-minimum
(greedy) matching. For AE tag costs this is almost always identical to the
optimal assignment (inter-person tag distances are either clearly below
tag_thr or far above), but it is an approximation; the host
``match_by_tag`` remains the default for strict-parity evaluation.
"""
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["match_by_tag_device", "match_by_tag_batch"]

_BIG = 1e10


@functools.partial(
    jax.jit,
    static_argnames=(
        "joint_order", "vis_thr", "tag_thr", "use_rounded_norm",
        "ignore_too_much",
    ),
)
def match_by_tag_device(
    val_k: jnp.ndarray,
    tag_k: jnp.ndarray,
    ind_k: jnp.ndarray,
    joint_order: Tuple[int, ...],
    vis_thr: float = 0.1,
    tag_thr: float = 1.0,
    use_rounded_norm: bool = True,
    ignore_too_much: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group per-joint top-K candidates into instances (one image).

    Args:
        val_k: [K, M] heatmap values; tag_k: [K, M, L]; ind_k: [K, M, 2].

    Returns:
        groups [G=M, K, 3 + L] (x, y, score, tags) and group_valid [G] bool.
    """
    num_joints, max_num, tag_dim = tag_k.shape
    g_cap = max_num

    joints_all = jnp.concatenate(
        [ind_k, val_k[..., None], tag_k], axis=2
    )  # [K, M, 3+L]

    group_joints = jnp.zeros((g_cap, num_joints, 3 + tag_dim), jnp.float32)
    group_tag_sum = jnp.zeros((g_cap, tag_dim), jnp.float32)
    group_tag_cnt = jnp.zeros((g_cap,), jnp.float32)
    n_groups = jnp.int32(0)

    def add_joint(state, jidx, cand_mask, cands, tags):
        """Assign masked candidates of joint `jidx` to groups."""
        group_joints, group_tag_sum, group_tag_cnt, n_groups = state

        group_mean = group_tag_sum / jnp.maximum(group_tag_cnt, 1.0)[:, None]
        group_live = (jnp.arange(g_cap) < n_groups)

        # cost [M, G]: L2 distance candidate-tag -> group-mean-tag
        diff = tags[:, None, :] - group_mean[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=2))
        dist_saved = dist
        if use_rounded_norm:
            dist = jnp.round(dist)
        cost = jnp.where(cand_mask[:, None] & group_live[None, :], dist, _BIG)

        # iterated-global-min assignment: M rounds, each picks the cheapest
        # remaining (candidate, group) pair
        def round_body(_, carry):
            (cost_m, assign) = carry
            flat = jnp.argmin(cost_m)
            r = flat // g_cap
            c = flat % g_cap
            ok = cost_m[r, c] < _BIG
            assign = assign.at[r].set(jnp.where(ok, c, assign[r]))
            cost_m = cost_m.at[r, :].set(jnp.where(ok, _BIG, cost_m[r, :]))
            cost_m = cost_m.at[:, c].set(jnp.where(ok, _BIG, cost_m[:, c]))
            return (cost_m, assign)

        assign0 = jnp.full((max_num,), -1, jnp.int32)
        _, assign = jax.lax.fori_loop(
            0, max_num, round_body, (cost, assign0)
        )

        # joins: assigned pair below tag_thr (unrounded distance)
        pair_dist = jnp.take_along_axis(
            dist_saved, jnp.maximum(assign, 0)[:, None], axis=1
        )[:, 0]
        joins = cand_mask & (assign >= 0) & (pair_dist < tag_thr)

        # spawn: valid candidate that did not join
        spawns = cand_mask & ~joins
        if ignore_too_much:
            spawns = spawns & (n_groups < g_cap)

        # apply joins (each group receives at most one candidate per joint)
        def apply_join(m, state):
            group_joints, group_tag_sum, group_tag_cnt = state
            g = jnp.maximum(assign[m], 0)
            do = joins[m]
            group_joints = group_joints.at[g, jidx].set(
                jnp.where(do, cands[m], group_joints[g, jidx])
            )
            group_tag_sum = group_tag_sum.at[g].add(
                jnp.where(do, tags[m], 0.0)
            )
            group_tag_cnt = group_tag_cnt.at[g].add(jnp.where(do, 1.0, 0.0))
            return (group_joints, group_tag_sum, group_tag_cnt)

        group_joints, group_tag_sum, group_tag_cnt = jax.lax.fori_loop(
            0, max_num, apply_join, (group_joints, group_tag_sum, group_tag_cnt)
        )

        # apply spawns sequentially (capacity-bounded)
        def apply_spawn(m, state):
            group_joints, group_tag_sum, group_tag_cnt, n_groups = state
            do = spawns[m] & (n_groups < g_cap)
            g = jnp.minimum(n_groups, g_cap - 1)
            group_joints = group_joints.at[g, jidx].set(
                jnp.where(do, cands[m], group_joints[g, jidx])
            )
            group_tag_sum = group_tag_sum.at[g].set(
                jnp.where(do, tags[m], group_tag_sum[g])
            )
            group_tag_cnt = group_tag_cnt.at[g].set(
                jnp.where(do, 1.0, group_tag_cnt[g])
            )
            n_groups = n_groups + jnp.where(do, 1, 0)
            return (group_joints, group_tag_sum, group_tag_cnt, n_groups)

        group_joints, group_tag_sum, group_tag_cnt, n_groups = jax.lax.fori_loop(
            0, max_num, apply_spawn,
            (group_joints, group_tag_sum, group_tag_cnt, n_groups),
        )
        return (group_joints, group_tag_sum, group_tag_cnt, n_groups)

    state = (group_joints, group_tag_sum, group_tag_cnt, n_groups)
    for jidx in joint_order:
        cands = joints_all[jidx]  # [M, 3+L]
        tags = tag_k[jidx]  # [M, L]
        cand_mask = cands[:, 2] > vis_thr
        state = add_joint(state, jidx, cand_mask, cands, tags)

    group_joints, _, group_tag_cnt, n_groups = state
    group_valid = jnp.arange(g_cap) < n_groups
    return group_joints, group_valid


def match_by_tag_batch(
    val_k: jnp.ndarray,
    tag_k: jnp.ndarray,
    ind_k: jnp.ndarray,
    joint_order: List[int],
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmap over a batch: [N, K, M...] -> ([N, G, K, 3+L], [N, G])."""
    fn = functools.partial(
        match_by_tag_device, joint_order=tuple(joint_order), **kwargs
    )
    return jax.vmap(fn)(val_k, tag_k, ind_k)
