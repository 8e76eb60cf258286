"""Preset fidelity: PRESETS must pin the exact DIFFormer-s hyperparameters
of the reference run scripts (BASELINE.md reproduction matrix). Values here
are transcribed from the run.sh lines cited in utils/config.py — this test
locks them against drift."""

from difformer_tpu.utils.config import make_config


def test_node_track_presets_match_run_sh():
    cora = make_config("cora")
    assert (cora.lr, cora.weight_decay, cora.dropout) == (0.001, 0.01, 0.2)
    assert (cora.num_layers, cora.hidden_channels) == (8, 64)
    assert cora.rand_split_class and cora.runs == 5 and cora.seed == 123
    assert cora.use_graph and cora.use_bn and cora.use_residual

    cs = make_config("citeseer")
    assert (cs.lr, cs.weight_decay, cs.dropout) == (0.001, 1.0, 0.2)
    assert cs.num_layers == 4

    pm = make_config("pubmed")
    assert (pm.lr, pm.weight_decay, pm.dropout) == (0.001, 1e-4, 0.2)
    assert pm.num_layers == 8


def test_large_graph_presets_match_run_sh():
    pr = make_config("ogbn-proteins")
    # run.sh:37-39 passes --use_bn; dropout is parse.py's default 0.0
    assert pr.use_bn and pr.dropout == 0.0 and pr.weight_decay == 0.0
    assert (pr.num_layers, pr.hidden_channels) == (3, 64)
    assert pr.use_minibatch and pr.batch_size == 10000
    assert (pr.epochs, pr.eval_step, pr.metric) == (1000, 9, "rocauc")

    pk = make_config("pokec")
    assert pk.rand_split and pk.batch_size == 100000
    assert (pk.hidden_channels, pk.train_prop, pk.valid_prop) == (128, 0.5,
                                                                  0.25)


def test_heterophily_presets_match_run_sh():
    film = make_config("film")
    # run.sh:47-50: film has NO --use_graph
    assert not film.use_graph and film.use_bn and film.use_residual
    assert (film.lr, film.weight_decay, film.dropout) == (0.001, 0.1, 0.5)
    assert film.seed == 42 and film.epochs == 300

    sq = make_config("squirrel")
    # run.sh:57-60: no --use_bn / --use_residual
    assert sq.use_graph and not sq.use_bn and not sq.use_residual
    assert sq.graph_weight == 0.8 and sq.runs == 10

    ch = make_config("chameleon")
    assert ch.graph_weight == 0.7 and ch.hidden_channels == 128
    assert (ch.lr, ch.weight_decay, ch.dropout) == (0.01, 1e-4, 0.2)


def test_set_track_presets_match_run_sh():
    stl = make_config("stl10")
    # image and text/run.sh:7-10: no --use_graph (pure set encoder)
    assert stl.task == "set" and not stl.use_graph
    assert (stl.lr, stl.weight_decay, stl.dropout) == (5e-4, 0.1, 0.0)
    assert (stl.hidden_channels, stl.epochs, stl.valid_num) == (400, 600,
                                                                1000)
    assert make_config("cifar10").lr == 1e-4
    assert make_config("20news").seed == 42


def test_temporal_and_particle_presets_match_run_sh():
    cp = make_config("chickenpox")
    assert (cp.lr, cp.weight_decay, cp.dropout) == (0.01, 0.0, 0.2)
    wm = make_config("wikimath")
    assert wm.lr == 0.005 and wm.temporal_mode == "incremental"

    at = make_config("actstrack")
    assert (at.lr, at.weight_decay, at.dropout) == (0.0015, 1e-3, 0.4)
    assert (at.batch_size, at.epochs, at.runs) == (1024, 150, 3)
    t3 = make_config("tau3mu")
    assert (t3.lr, t3.weight_decay, t3.batch_size) == (0.015, 5e-5, 8192)
    sm = make_config("synmol")
    assert sm.alpha == 0.3 and sm.weight_decay == 1e-4
