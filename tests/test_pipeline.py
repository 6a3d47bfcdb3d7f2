"""Double-buffered pipeline unit tests."""

import numpy as np

from epik_tpu.core.tree import parse_newick, to_newick
from epik_tpu.engine.pipeline import run_pipeline
from epik_tpu.engine.placer import JaxPlacer
from epik_tpu.engine.reference import ReferencePlacer
from epik_tpu.io.build import random_db, random_reads
from epik_tpu.io.jplace import jplace_writer
from epik_tpu.tools.jplace_diff import jplace_diff


class _ListReader:
    def __init__(self, batches):
        self._batches = list(batches)
        self._i = 0
        self._bytes = 0

    def next_batch(self):
        if self._i >= len(self._batches):
            return []
        b = self._batches[self._i]
        self._i += 1
        self._bytes += sum(len(s) for _, s in b)
        return b

    def bytes_read(self):
        return self._bytes


def _write(placer, batches, path, nwk):
    w = jplace_writer(str(path), "inv ", nwk)
    w.start()
    stats = run_pipeline(placer, _ListReader(batches), w)
    w.end()
    return stats


def test_pipeline_matches_sync(tmp_path):
    db = random_db(num_leaves=16, kmer_size=6, num_kmers=1024, seed=55)
    tree = parse_newick(db.tree())
    nwk = to_newick(tree, jplace_edges=True)
    reads = random_reads(50, length=30, seed=56, ambig_rate=0.05)
    batches = [reads[i : i + 12] for i in range(0, 50, 12)]

    s1 = _write(JaxPlacer(db, tree), batches, tmp_path / "a.jplace", nwk)
    s2 = _write(ReferencePlacer(db, tree), batches, tmp_path / "b.jplace", nwk)
    assert s1.num_seq_placed == s2.num_seq_placed == 50
    assert s1.num_iterations == len(batches)
    res = jplace_diff(str(tmp_path / "a.jplace"), str(tmp_path / "b.jplace"))
    assert res.clean, res.mismatches[:3]


def test_pipeline_empty_input(tmp_path):
    db = random_db(num_leaves=8, kmer_size=5, num_kmers=64, seed=57)
    tree = parse_newick(db.tree())
    nwk = to_newick(tree, jplace_edges=True)
    s = _write(JaxPlacer(db, tree), [], tmp_path / "e.jplace", nwk)
    assert s.num_seq_placed == 0


def test_pipeline_reader_error_propagates(tmp_path):
    class _Boom(_ListReader):
        def next_batch(self):
            raise RuntimeError("boom")

    db = random_db(num_leaves=8, kmer_size=5, num_kmers=64, seed=58)
    tree = parse_newick(db.tree())
    w = jplace_writer(str(tmp_path / "x.jplace"), "inv ", to_newick(tree, True))
    w.start()
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        run_pipeline(JaxPlacer(db, tree), _Boom([]), w)
