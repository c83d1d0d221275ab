"""MatchServer micro-batching: results equal direct match(); batching real."""

import numpy as np
import pytest

from hpfw_tpu import api, oracle
from hpfw_tpu.io import synth
from hpfw_tpu.match.scaled import TwoStageDB
from hpfw_tpu.serve import MatchServer


def _filters(cfg, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((cfg.context_dim, cfg.n_filters)) / np.sqrt(cfg.context_dim)
    return oracle.fix_eigenvector_signs(f).astype(np.float32)


@pytest.fixture(scope="module")
def served(cfg):
    tracks = synth.synth_catalog(16, 4.0, cfg)
    filters = _filters(cfg)
    db = api.build_db(tracks, filters, cfg)
    ts = TwoStageDB(db, stride=4, use_pallas_fine=True, coarse_tile=8,
                    pallas_interpret=True)
    return cfg, tracks, filters, ts


def test_server_results_equal_direct_match(served):
    cfg, tracks, filters, ts = served
    queries = []
    for seed in range(6):
        q = synth.make_query(tracks[seed + 4], 0.5, 2.0, cfg,
                             noise_db=-15.0, seed=seed)
        queries.append(api.fingerprint(q, filters, cfg))
    n_q = min(q.shape[0] for q in queries)
    queries = [q[:n_q] for q in queries]
    with MatchServer(ts, n_q, max_batch=4, max_wait_ms=30.0,
                     pool=16) as srv:
        futs = [srv.submit(q) for q in queries]
        got = [f.result(timeout=120) for f in futs]
    for q, (ids, scores, offs) in zip(queries, got):
        w_ids, w_scores, w_offs = ts.match(q, pool=16)
        assert ids == w_ids
        np.testing.assert_array_equal(scores, w_scores)
        np.testing.assert_array_equal(offs, w_offs)


def test_server_rejects_wrong_length_and_closes(served):
    cfg, tracks, filters, ts = served
    srv = MatchServer(ts, 40, max_batch=2, max_wait_ms=1.0, pool=16)
    bad = srv.submit(np.zeros((7, 2), np.uint32))
    with pytest.raises(ValueError):
        bad.result(timeout=10)
    srv.close()
    late = srv.submit(np.zeros((40, 2), np.uint32))
    with pytest.raises(RuntimeError):
        late.result(timeout=10)


def test_server_bounded_queue_sheds_load(served):
    """When the submit queue is full the server rejects with ServerSaturated
    instead of queueing unboundedly; accepted queries still resolve
    correctly."""
    from hpfw_tpu.serve import ServerSaturated

    cfg, tracks, filters, ts = served
    q = synth.make_query(tracks[5], 0.5, 2.0, cfg, noise_db=-15.0, seed=9)
    qfp = api.fingerprint(q, filters, cfg)
    with MatchServer(ts, qfp.shape[0], max_batch=1, max_wait_ms=0.1,
                     depth=1, max_queue=2, pool=16) as srv:
        futs = [srv.submit(qfp) for _ in range(40)]
        done = [f.result(timeout=300) if not f.exception(timeout=300)
                else None for f in futs]
    rejected = sum(d is None for d in done)
    accepted = [d for d in done if d is not None]
    assert rejected > 0, "a 2-deep queue must shed some of 40 instant submits"
    assert accepted, "some submissions must still be served"
    for f, d in zip(futs, done):
        if d is None:
            assert isinstance(f.exception(), ServerSaturated)
    w_ids, w_scores, _ = ts.match(qfp, pool=16)
    for ids, scores, _ in accepted:
        assert ids == w_ids
        np.testing.assert_array_equal(scores, w_scores)


def test_server_on_mesh(cfg):
    """MatchServer over a mesh-sharded TwoStageDB (8-device CPU sim)."""
    import jax

    from hpfw_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU sim")
    tracks = synth.synth_catalog(16, 4.0, cfg)
    filters = _filters(cfg)
    db = api.build_db(tracks, filters, cfg)
    mesh = meshlib.db_mesh(8)
    ts = TwoStageDB(db, stride=4, mesh=mesh, use_pallas_fine=True,
                    coarse_tile=8, pallas_interpret=True)
    q = synth.make_query(tracks[6], 0.5, 2.0, cfg, noise_db=-15.0, seed=1)
    qfp = api.fingerprint(q, filters, cfg)
    with MatchServer(ts, qfp.shape[0], max_batch=4, max_wait_ms=10.0,
                     pool=16) as srv:
        ids, scores, offs = srv.match(qfp)
    w_ids, w_scores, w_offs = ts.match(qfp, pool=16)
    assert ids == w_ids
    np.testing.assert_array_equal(scores, w_scores)
