"""DBoW2 text vocabulary: loader round-trip + batched tree descent vs a
straightforward per-descriptor reference walk."""
import numpy as np

from hfvo_tpu.bow.dbow2 import (
    DBoW2Vocab,
    compute_words_tree,
    load_dbow2_text,
    save_dbow2_text,
)


def _random_vocab(rng, k=3, L=3):
    """Build a full k-ary tree of depth L with random descriptors."""
    children_list = {}
    desc = [np.zeros(8, np.uint32)]
    nodes = [0]
    frontier = [0]
    for _ in range(L):
        nxt = []
        for p in frontier:
            ch = []
            for _ in range(k):
                nid = len(desc)
                desc.append(rng.integers(0, 2**32, 8, dtype=np.uint64).astype(np.uint32))
                nodes.append(nid)
                ch.append(nid)
                nxt.append(nid)
            children_list[p] = ch
        frontier = nxt
    M = len(desc)
    children = np.full((M, k), -1, np.int32)
    for p, ch in children_list.items():
        children[p, : len(ch)] = ch
    is_leaf = np.ones((M,), bool)
    is_leaf[list(children_list.keys())] = False
    word_id = np.full((M,), -1, np.int32)
    leaves = np.nonzero(is_leaf)[0]
    word_id[leaves] = np.arange(len(leaves), dtype=np.int32)
    return DBoW2Vocab(
        children=children,
        desc=np.stack(desc),
        is_leaf=is_leaf,
        word_id=word_id,
        word_weight=rng.random(len(leaves)).astype(np.float32),
        k=k,
        L=L,
        n_words=len(leaves),
    )


def _popcount(x):
    return bin(int(x)).count("1")


def _walk_reference(q, vocab):
    cur = 0
    while not vocab.is_leaf[cur]:
        ch = [c for c in vocab.children[cur] if c >= 0]
        dists = [
            sum(_popcount(vocab.desc[c, w] ^ q[w]) for w in range(8)) for c in ch
        ]
        cur = ch[int(np.argmin(dists))]
    return vocab.word_id[cur]


def test_tree_descent_matches_reference_walk(rng):
    import jax.numpy as jnp

    vocab = _random_vocab(np.random.default_rng(0))
    q = np.random.default_rng(1).integers(0, 2**32, (64, 8), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(compute_words_tree(jnp.asarray(q), vocab))
    want = np.array([_walk_reference(qi, vocab) for qi in q])
    np.testing.assert_array_equal(got, want)
    assert got.min() >= 0 and got.max() < vocab.n_words


def test_text_roundtrip(tmp_path):
    import jax.numpy as jnp

    vocab = _random_vocab(np.random.default_rng(2), k=4, L=2)
    path = str(tmp_path / "voc.txt")
    save_dbow2_text(path, vocab)
    v2 = load_dbow2_text(path)
    assert v2.k == vocab.k and v2.L == vocab.L and v2.n_words == vocab.n_words
    q = np.random.default_rng(3).integers(0, 2**32, (32, 8), dtype=np.uint64).astype(np.uint32)
    w1 = np.asarray(compute_words_tree(jnp.asarray(q), vocab))
    w2 = np.asarray(compute_words_tree(jnp.asarray(q), v2))
    np.testing.assert_array_equal(w1, w2)
