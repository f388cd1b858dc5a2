"""Golden-value ETL test: a tiny hand-computed corpus exercising every
read_behaviors rule (preprocess.py:5-89): min-length filter, truncation,
id re-densification, leave-one-out split, histories, popularity priors."""

import numpy as np
import pytest

from iisan_tpu.data.preprocess import read_behaviors, read_items


@pytest.fixture()
def golden(tmp_path):
    # 4 items; item C never appears in a surviving sequence -> dropped.
    with open(tmp_path / "items.tsv", "w") as f:
        for name in ["A", "B", "C", "D"]:
            f.write(f"{name}\ttitle {name}\n")
    # u0: 6 interactions (kept); u1: 2 (< min_seq_len=5 -> filtered)
    with open(tmp_path / "users.tsv", "w") as f:
        f.write("u0\tA B A D B A\n")
        f.write("u1\tC C\n")
    return tmp_path


def test_golden_semantics(golden):
    titles, n2i, i2n = read_items(str(golden / "items.tsv"))
    c = read_behaviors(str(golden / "users.tsv"), n2i, i2n,
                       max_seq_len=4, min_seq_len=5)
    # only u0 survives; C dropped, ids re-densified A=1,B=2,D=3
    assert c.n_users == 1
    assert c.item_num == 3
    assert c.item_names == ["<pad>", "A", "B", "D"]

    # u0 seq truncated to last max_seq_len+3 = 7 -> full 6: A B A D B A
    # = [1,2,1,3,2,1]; train = seq[:-2] = [1,2,1,3]
    # train sample: left-pad to L+1=5 -> [0,1,2,1,3]; log_mask len L=4,
    # ones = len(train)-1 = 3 -> [0,1,1,1]
    np.testing.assert_array_equal(c.train_seqs[0], [0, 1, 2, 1, 3])
    np.testing.assert_array_equal(c.train_log_mask[0], [0, 1, 1, 1])

    # valid = seq[-(L+2):-1] = seq[-6:-1] = [1,2,1,3,2]; target=2,
    # tokens=[1,2,1,3] left-padded to L=4
    assert c.valid_target[0] == 2
    np.testing.assert_array_equal(c.valid_tokens[0], [1, 2, 1, 3])
    np.testing.assert_array_equal(c.valid_log_mask[0], [1, 1, 1, 1])
    # valid history = train items
    assert sorted(set(c.valid_history[0]) - {0}) == [1, 2, 3]

    # test = seq[-(L+1):] = [2,1,3,2,1]; target=1, tokens=[2,1,3,2]
    assert c.test_target[0] == 1
    np.testing.assert_array_equal(c.test_tokens[0], [2, 1, 3, 2])
    # test history = seq[:-1] = [1,2,1,3,2]
    assert sorted(set(c.test_history[0]) - {0}) == [1, 2, 3]

    # popularity: train counts A=2,B=1,D=1 -> [.5,.25,.25]; pad prob 1
    np.testing.assert_allclose(c.pop_prob, [1.0, 0.5, 0.25, 0.25])


# n_items = count after interaction-filtering + re-densification
# (preprocess.py:58-76 semantics), not the raw TSV line count.
REF_DATASETS = [
    ("Instrument", "Musical_Instruments_items.tsv",
     "am_Musical_Instruments_users_10K.tsv", 10000, 19246),
    ("Scientific", "Industrial_and_Scientific_items.tsv",
     "am_Industrial_and_Scientific_users.tsv", 12076, 20314),
]


@pytest.mark.parametrize("name,items,users,n_users,n_items", REF_DATASETS)
def test_reference_datasets_etl(name, items, users, n_users, n_items):
    """ETL over every shipped reference dataset (SURVEY.md section 2.1 #20):
    the per-dataset launcher variants (run_IISAN_ins.py etc.) differ only
    in file names, so the same reader must handle all of them."""
    import os

    base = f"/root/reference/Dataset/{name}"
    if not (os.path.exists(f"{base}/{items}")
            and os.path.exists(f"{base}/{users}")):
        pytest.skip(f"{name} data not shipped in this snapshot")
    titles, n2i, i2n = read_items(f"{base}/{items}")
    c = read_behaviors(f"{base}/{users}", n2i, i2n, 10, 5)
    assert c.n_users == n_users
    assert c.item_num == n_items
    # leave-one-out split invariants
    assert c.train_seqs.shape == (n_users, 11)
    assert c.valid_target.min() >= 1 and c.valid_target.max() <= n_items
    assert c.pop_prob.shape == (n_items + 1,)
    assert np.isclose(c.pop_prob[1:].sum(), 1.0, atol=1e-5)


def test_items_from_behaviors_office():
    """Behaviors-only item registry (Office ships no items TSV): dense
    1-based first-seen ids, titles empty; the ETL densifies identically
    to a registry that carried extra never-interacted catalog rows."""
    from iisan_tpu.data.preprocess import items_from_behaviors

    import io, os, tempfile

    tsv = "u1\tA B C\nu2\tB D\n"
    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as f:
        f.write(tsv)
        p = f.name
    titles, n2i, i2n = items_from_behaviors(p)
    os.unlink(p)
    assert n2i == {"A": 1, "B": 2, "C": 3, "D": 4}
    assert i2n[2] == "B" and titles[1] == ""

    office = "/root/reference/Dataset/Office/am_Office_Products_users_10K.tsv"
    if not os.path.exists(office):
        pytest.skip("Office behaviors not shipped")
    titles, n2i, i2n = items_from_behaviors(office)
    c = read_behaviors(office, n2i, i2n, 10, 5)
    assert c.n_users == 10000 and c.item_num == 22785
