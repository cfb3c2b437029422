"""Associative-embedding grouping: greedy-by-joint Hungarian matching.

Parity: /root/reference/mindpose/utils/match.py:14-116 — iterate joints in
``joint_order``; assign top-K candidates to running instance groups by L2 tag
distance (optionally rounded) using ``scipy.optimize.linear_sum_assignment``;
spawn a new group when the (unrounded) distance exceeds ``tag_thr``.

Host-side per-image at eval. A jittable fixed-capacity variant for fully
on-device decoding lives in mindpose_tpu.ops.grouping.
"""
from collections import defaultdict
from typing import List

import numpy as np
import scipy.optimize

__all__ = ["match_by_tag"]


def _max_match(scores: np.ndarray) -> np.ndarray:
    assoc = scipy.optimize.linear_sum_assignment(scores)
    return np.array(assoc).T.astype(np.int32)


def match_by_tag(
    val_k: np.ndarray,
    tag_k: np.ndarray,
    ind_k: np.ndarray,
    joint_order: List[int],
    vis_thr: float = 0.1,
    tag_thr: float = 1.0,
    ignore_too_much: bool = False,
    use_rounded_norm: bool = True,
) -> np.ndarray:
    """Group per-joint top-K candidates into instances by tag similarity.

    Args:
        val_k: heatmap values, [K, M]
        tag_k: tag embeddings, [K, M, L]
        ind_k: candidate (x, y) locations, [K, M, 2]
        joint_order: joint visiting order for grouping

    Returns:
        [num_instances, K, 3 + L] array (x, y, score, tags...).
    """
    num_joints, max_num, tag_dim = tag_k.shape

    default = np.zeros((num_joints, 3 + tag_dim), np.float32)
    joint_k = np.concatenate((ind_k, val_k[..., None], tag_k), axis=2)

    joint_dict = defaultdict(lambda: default.copy())
    tag_dict = {}

    for i in range(num_joints):
        idx = joint_order[i]

        tags = tag_k[idx]
        joints = joint_k[idx]
        mask = joints[:, 2] > vis_thr
        tags = tags[mask]
        if tags.shape[0] == 0:
            continue
        joints = joints[mask]

        if i == 0 or len(joint_dict) == 0:
            for j in range(tags.shape[0]):
                key = tags[j, 0]
                joint_dict[key][idx] = joints[j]
                tag_dict[key] = [tags[j]]
            continue

        grouped_keys = list(joint_dict.keys())
        if ignore_too_much and len(grouped_keys) == max_num:
            continue
        grouped_tags = np.stack(
            [np.mean(np.stack(tag_dict[x]), axis=0) for x in grouped_keys]
        )

        diff = joints[:, None, 3:] - grouped_tags[None, :, :]
        diff_normed = np.linalg.norm(diff, ord=2, axis=2)
        diff_saved = diff_normed.copy()
        if use_rounded_norm:
            diff_normed = np.round(diff_normed)

        num_added = diff.shape[0]
        num_grouped = diff.shape[1]
        if num_added > num_grouped:
            diff_normed = np.concatenate(
                (
                    diff_normed,
                    np.zeros((num_added, num_added - num_grouped), np.float32) + 1e10,
                ),
                axis=1,
            )

        pairs = _max_match(diff_normed)
        for row, col in pairs:
            if (
                row < num_added
                and col < num_grouped
                and diff_saved[row][col] < tag_thr
            ):
                key = grouped_keys[col]
                joint_dict[key][idx] = joints[row]
                tag_dict[key].append(tags[row])
            else:
                key = tags[row, 0]
                joint_dict[key][idx] = joints[row]
                tag_dict[key] = [tags[row]]

    return np.array(list(joint_dict.values())).astype(np.float32)
