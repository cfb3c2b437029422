"""Jittable associative-embedding grouping (on-device decode path).

The reference groups candidates on host with a growing dict + scipy Hungarian
per joint (/root/reference/mindpose/utils/match.py:14-116) — inherently
sequential and host-bound (HOT LOOP #3 in SURVEY.md §3). This version keeps
the same greedy-by-joint structure but with **fixed-capacity dense state**
([max_num] groups) and a jittable assignment, so whole-batch grouping runs
under jit/vmap on TPU.

Assignment note: scipy's Hungarian is replaced by a jittable
shortest-augmenting-path LSAP solver (`_lsap`, the Jonker-Volgenant
row-by-row formulation) over a fixed-size padded cost matrix, so the
assignment is *optimal* — identical to the reference's
``scipy.optimize.linear_sum_assignment`` whenever the optimum is unique
(always, for unrounded tag distances; rounded distances can create
total-cost ties where any optimal solver's tie-break is arbitrary —
including scipy's own).
"""
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["match_by_tag_device", "match_by_tag_batch"]

_BIG = 1e10
_INF = jnp.float32(1e30)


def _lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """Optimal rectangular linear-sum-assignment under jit.

    Jonker-Volgenant shortest-augmenting-path (the classic row-by-row
    formulation), giving the same assignment as
    ``scipy.optimize.linear_sum_assignment`` whenever the optimum is unique.
    Requires ``n_rows <= n_cols``; every row is assigned a distinct column.

    Args:
        cost: [n, m] float32 cost matrix, n <= m, finite entries.

    Returns:
        [n] int32 column index assigned to each row.
    """
    n, m = cost.shape

    def solve_row(i1, carry):
        u, v, p = carry  # potentials [n+1], [m+1]; p[j] = row (1-based) on col j
        p = p.at[0].set(i1.astype(jnp.int32))
        way = jnp.zeros(m + 1, jnp.int32)
        minv = jnp.full(m + 1, _INF)
        used = jnp.zeros(m + 1, bool)

        def search_cond(st):
            _, _, p, _, _, _, j0 = st
            return p[j0] != 0

        def search_body(st):
            u, v, p, way, minv, used, j0 = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            upd = (~used[1:]) & (cur < minv[1:])
            minv = minv.at[1:].set(jnp.where(upd, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(upd, j0, way[1:]))
            masked = jnp.where(used[1:], _INF, minv[1:])
            j1 = jnp.argmin(masked).astype(jnp.int32) + 1
            delta = masked[j1 - 1]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, p, way, minv, used, j1)

        u, v, p, way, minv, used, j0 = jax.lax.while_loop(
            search_cond, search_body,
            (u, v, p, way, minv, used, jnp.int32(0)),
        )

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(
            lambda st: st[1] != 0, aug_body, (p, j0)
        )
        return (u, v, p)

    u0 = jnp.zeros(n + 1, jnp.float32)
    v0 = jnp.zeros(m + 1, jnp.float32)
    p0 = jnp.zeros(m + 1, jnp.int32)
    _, _, p = jax.lax.fori_loop(1, n + 1, solve_row, (u0, v0, p0))

    row_of_col = p[1:]  # [m], 1-based row or 0
    ans = jnp.zeros(n, jnp.int32)
    rows = jnp.where(row_of_col > 0, row_of_col - 1, n)
    ans = ans.at[rows].set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    return ans


@functools.partial(
    jax.jit,
    static_argnames=(
        "joint_order", "vis_thr", "tag_thr", "use_rounded_norm",
        "ignore_too_much", "group_cap",
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
    group_cap: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group per-joint top-K candidates into instances (one image).

    Args:
        val_k: [K, M] heatmap values; tag_k: [K, M, L]; ind_k: [K, M, 2].
        group_cap: fixed group capacity G (0 -> M). The reference's group
            dict is unbounded; in real scenes instance counts stay far below
            M, but pathological tag fields can spawn more groups — raise the
            cap when strict oracle parity on such fields is needed.

    Returns:
        groups [G, K, 3 + L] (x, y, score, tags) and group_valid [G] bool.
    """
    num_joints, max_num, tag_dim = tag_k.shape
    g_cap = group_cap if group_cap else max_num

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

        # reference semantics: when ignore_too_much and the group set is
        # full, the ENTIRE joint is skipped (no joins either) —
        # /root/reference/mindpose/utils/match.py:75-76
        if ignore_too_much:
            cand_mask = cand_mask & (n_groups < max_num)

        group_mean = group_tag_sum / jnp.maximum(group_tag_cnt, 1.0)[:, None]
        group_live = (jnp.arange(g_cap) < n_groups)

        # cost [M, G]: L2 distance candidate-tag -> group-mean-tag
        diff = tags[:, None, :] - group_mean[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=2))
        dist_saved = dist
        valid2d = cand_mask[:, None] & group_live[None, :]
        if use_rounded_norm:
            # round like the reference, but break integer-cost ties by the
            # real distance: among rounded-optimal assignments the solver
            # then picks the unrounded-minimal one — deterministic and
            # join-preserving, where scipy's tie-break in the reference is
            # an implementation accident. eps is sized so the bias can
            # never flip a strict rounded-cost ordering: the total bias
            # over an assignment is < M * eps * (dmax + 1) = 0.5, below
            # the minimal integer gap of 1.
            dmax_u = jnp.max(jnp.where(valid2d, dist, 0.0))
            eps = 0.5 / (max_num * (dmax_u + 1.0))
            dist = jnp.round(dist) + eps * dist

        # padded square-ish LSAP, [M, G_cap + M]: real group columns plus one
        # "spawn" pad column per candidate. Pad costs exceed every real
        # distance, so — exactly like the reference's 1e10-padded Hungarian —
        # pads are used only by candidates that cannot get a live column
        # (n_cands > n_groups), and *which* candidates those are is decided
        # by minimizing total cost over the real block.
        dmax = jnp.max(jnp.where(valid2d, dist, 0.0))
        pad_c = dmax * 2.0 + 10.0  # valid-row spawn cost
        inval = dmax * 4.0 + 100.0  # masked row / dead column: never chosen
        real_cost = jnp.where(valid2d, dist, inval)
        pad_cost = jnp.where(
            cand_mask[:, None], pad_c, 0.0
        ) * jnp.ones((1, max_num), jnp.float32)
        cost = jnp.concatenate([real_cost, pad_cost], axis=1)

        assign = _lsap(cost)  # [M] column per candidate

        # joins: assigned a live group column, unrounded distance < tag_thr
        gcol = jnp.minimum(assign, g_cap - 1)
        pair_dist = jnp.take_along_axis(dist_saved, gcol[:, None], axis=1)[:, 0]
        joins = (
            cand_mask
            & (assign < g_cap)
            & group_live[gcol]
            & (pair_dist < tag_thr)
        )

        # spawn: valid candidate that did not join
        spawns = cand_mask & ~joins

        # apply joins (each group receives at most one candidate per joint)
        def apply_join(m, state):
            group_joints, group_tag_sum, group_tag_cnt = state
            g = jnp.minimum(assign[m], g_cap - 1)
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
