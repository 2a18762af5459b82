"""Binary bag-of-words vocabulary: hierarchical k-medians tree over BRIEF-256
descriptors, with a fully vectorized device transform.

Parity (WHAT): DBoW2 TemplatedVocabulary/Database + fbow as used by the
reference (ORBVocabulary.h, FrontEnd vocab loading FrontEnd.h:133-155,
loop-closure DB LoopCloser.cpp:75-112). The reference walks a pointer tree
per descriptor on CPU; here the tree levels are dense arrays and a whole
frame's descriptors descend the tree together (gather + popcount argmin per
level), and database scoring is one matvec on the MXU.

Scoring deviation (documented): DBoW2 defaults to L1 scoring
(1 - 0.5|v-w|_1); we use cosine similarity of L2-normalized tf-idf vectors
because it turns database lookup into a dense matmul. Both are monotone
similarity measures over the same BoW representation; thresholds are
calibrated accordingly (nss-normalized, as in the reference).

Training: k-medians with bitwise majority-vote centroids (the standard
binary-descriptor k-means), run offline on host numpy; vocabularies are
saved/loaded as .npz.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mcslam_tpu.ops import hamming


def _popcount_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(np.int32)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 8) x (M, 8) -> (N, M) int32."""
    return _popcount_np(a[:, None, :] ^ b[None, :, :]).sum(-1)


def _majority_centroid(descs: np.ndarray) -> np.ndarray:
    """Bitwise majority vote -> (8,) uint32 centroid."""
    bits = np.unpackbits(
        descs.view(np.uint8).reshape(len(descs), 32), axis=1, bitorder="little"
    )
    maj = (bits.sum(0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


class Vocabulary:
    """Array-form vocabulary tree.

    nodes:    (n_nodes, 8) uint32 centroids (level-major BFS layout)
    children: (n_nodes, k) int32 child node index (-1 past the end)
    word_id:  (n_nodes,) int32 leaf word id (-1 for internal nodes)
    weights:  (n_words,) float32 idf word weights
    """

    def __init__(self, nodes, children, word_id, weights, k, depth):
        self.nodes = np.asarray(nodes, np.uint32)
        self.children = np.asarray(children, np.int32)
        self.word_id = np.asarray(word_id, np.int32)
        self.weights = np.asarray(weights, np.float32)
        self.k = int(k)
        self.depth = int(depth)
        self.num_words = len(self.weights)
        # device copies
        self._d_child_centroids = None

    # -- training ----------------------------------------------------------

    @staticmethod
    def train(descriptors: np.ndarray, k: int = 8, depth: int = 4,
              iters: int = 6, seed: int = 0) -> "Vocabulary":
        """Hierarchical k-medians on (N, 8) uint32 descriptors."""
        rng = np.random.RandomState(seed)
        nodes = [np.zeros(8, np.uint32)]  # root placeholder
        children = [[]]
        assignments = [(0, descriptors)]
        word_id = [-1]
        leaves = []

        frontier = [(0, descriptors)]
        for level in range(depth):
            next_frontier = []
            for node_idx, descs in frontier:
                if len(descs) == 0:
                    continue
                kk = min(k, len(descs))
                # k-medians init: random distinct picks
                pick = rng.choice(len(descs), kk, replace=False)
                cents = descs[pick].copy()
                for _ in range(iters):
                    d = _hamming_np(descs, cents)
                    lbl = d.argmin(1)
                    for c in range(kk):
                        sel = descs[lbl == c]
                        if len(sel):
                            cents[c] = _majority_centroid(sel)
                d = _hamming_np(descs, cents)
                lbl = d.argmin(1)
                ch = []
                for c in range(kk):
                    nodes.append(cents[c])
                    children.append([])
                    word_id.append(-1)
                    idx = len(nodes) - 1
                    ch.append(idx)
                    sub = descs[lbl == c]
                    if level == depth - 1:
                        word_id[idx] = len(leaves)
                        leaves.append((idx, len(sub)))
                    else:
                        next_frontier.append((idx, sub))
                children[node_idx] = ch
            frontier = next_frontier

        n_nodes = len(nodes)
        child_arr = np.full((n_nodes, k), -1, np.int32)
        for i, ch in enumerate(children):
            child_arr[i, : len(ch)] = ch
        n_words = len(leaves)
        # idf weights from training counts
        counts = np.array([max(c, 1) for _, c in leaves], np.float64)
        idf = np.log(counts.sum() / counts).astype(np.float32)
        return Vocabulary(
            np.stack(nodes), child_arr, np.array(word_id, np.int32),
            idf, k, depth,
        )

    # -- persistence --------------------------------------------------------

    def save(self, path):
        np.savez_compressed(
            path, nodes=self.nodes, children=self.children,
            word_id=self.word_id, weights=self.weights,
            k=self.k, depth=self.depth,
        )

    @staticmethod
    def load(path) -> "Vocabulary":
        z = np.load(path)
        return Vocabulary(
            z["nodes"], z["children"], z["word_id"], z["weights"],
            int(z["k"]), int(z["depth"]),
        )

    # -- device transform ---------------------------------------------------

    def device_arrays(self):
        return (
            jnp.asarray(self.nodes),
            jnp.asarray(self.children),
            jnp.asarray(self.word_id),
            jnp.asarray(self.weights),
        )

    def transform(self, desc: jax.Array, valid: jax.Array) -> jax.Array:
        """(M, 8) descriptors -> L2-normalized dense tf-idf BoW (n_words,).

        One gather + popcount argmin per tree level, vectorized over all
        descriptors of the frame.
        """
        nodes, children, word_id, weights = self.device_arrays()
        return _transform_impl(
            desc, valid, nodes, children, word_id, weights,
            self.k, self.depth, self.num_words,
        )

    def word_ids(self, desc: jax.Array) -> jax.Array:
        nodes, children, word_id, _ = self.device_arrays()
        return word_id[
            _descend_nodes(desc, nodes, children, self.k, self.depth)
        ]

    def node_ids(self, desc: jax.Array, levels_up: int = 2) -> jax.Array:
        """Direct-index equivalent (DBoW2 di_levels, reference
        LoopCloser di_levels=2, FrontEnd.cpp:1788-1805): the tree node each
        descriptor reaches `levels_up` levels above the leaves. Features
        sharing a node are candidate match pairs; restricting descriptor
        matching to those pairs is what DBoW2's direct index gives the
        reference's featureMatchesBow (LoopCloser.cpp:195-241)."""
        nodes, children, _, _ = self.device_arrays()
        stop = max(self.depth - int(levels_up), 1)
        return _descend_nodes(desc, nodes, children, self.k, stop)


def _descend_nodes(desc, nodes, children, k, n_levels):
    """(M, 8) -> (M,) tree node index after n_levels argmin descents."""
    M = desc.shape[0]
    cur = jnp.zeros(M, jnp.int32)  # root
    for _ in range(n_levels):
        ch = children[cur]  # (M, k)
        cents = nodes[jnp.maximum(ch, 0)]  # (M, k, 8)
        x = jnp.bitwise_xor(cents, desc[:, None, :])
        d = jnp.sum(hamming._popcount32(x), axis=-1)  # (M, k)
        d = jnp.where(ch >= 0, d, 1 << 20)
        cur = jnp.take_along_axis(ch, jnp.argmin(d, axis=1)[:, None], axis=1)[:, 0]
    return cur


def _descend(desc, nodes, children, word_id, k, depth):
    """(M, 8) -> (M,) leaf word ids."""
    return word_id[_descend_nodes(desc, nodes, children, k, depth)]


def _transform_impl(desc, valid, nodes, children, word_id, weights, k, depth,
                    num_words):
    wid = _descend(desc, nodes, children, word_id, k, depth)
    wid = jnp.where(valid, wid, num_words)  # invalid -> dropped bucket
    tf = jnp.zeros(num_words + 1, jnp.float32).at[wid].add(1.0)
    v = tf[:num_words] * weights
    n = jnp.linalg.norm(v)
    return v / jnp.maximum(n, 1e-9)


def score_database(query_bow: jax.Array, db_bows: jax.Array) -> jax.Array:
    """Cosine similarity of the query against every stored frame: one matvec
    (the MXU replacement for DBoW2's inverted-file accumulation)."""
    return db_bows @ query_bow
