from pdac_pathological_image_segmentation_tpu.utils import AverageMeter, EarlyStop


def test_average_meter_matches_reference_semantics():
    m = AverageMeter()
    m.update(1.0)
    m.update(2.0, n=3)
    assert m.val == 2.0
    assert m.count == 4
    assert m.sum == 7.0
    assert m.avg == 7.0 / 4


def test_early_stop_counts_below_best_plus_delta():
    # reference util.py:38-47: improvement must EXCEED best+delta to reset
    es = EarlyStop(patience=2, delta=0.02)
    es(0.5)  # sets best
    assert es.best_score == 0.5 and es.counter == 0
    es(0.51)  # 0.51 < 0.5+0.02 → counts as no improvement
    assert es.counter == 1 and not es.early_stop
    es(0.515)
    assert es.counter == 2 and es.early_stop


def test_early_stop_resets_on_real_improvement():
    es = EarlyStop(patience=3, delta=0.02)
    es(0.5)
    es(0.51)
    assert es.counter == 1
    es(0.53)  # >= best+delta? must be strictly above best+delta? 0.53 >= 0.52 → improvement
    assert es.counter == 0 and es.best_score == 0.53


def test_early_stop_state_roundtrip():
    es = EarlyStop(patience=4, delta=0.02)
    es(0.5)
    es(0.4)
    d = es.state_dict()
    es2 = EarlyStop()
    es2.load_state_dict(d)
    assert es2.best_score == 0.5 and es2.counter == 1 and es2.patience == 4
