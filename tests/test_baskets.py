"""Market-basket rules: exact support/confidence/lift."""


def test_basket_rules_reference(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import basket_rules

    # orders: {A,B,C}, {A,B}, {A,C}, {B}, {A,B} (dup line for A in o5)
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 20),
        (5, 10), (5, 20), (5, 10),  # duplicate (order,item) must dedup
    ]
    ds = ray.data.from_items([{"o": o, "i": i} for o, i in rows]).repartition(3)
    out = (
        basket_rules(ds, "o", "i", min_support=2)
        .to_pandas()
        .set_index(["x", "y"])
        .sort_index()
    )
    # n: A=4 orders, B=4, C=2; T=5
    # pairs: (10,20) in o1,o2,o5 -> 3; (10,30) in o1,o3 -> 2; (20,30) in o1 -> 1 (below minsup)
    assert set(out.index) == {(10, 20), (10, 30)}
    r = out.loc[(10, 20)]
    assert (r["n_xy"], r["n_x"], r["n_y"]) == (3, 4, 4)
    assert r["conf_xy_e6"] == 3 * 10**6 // 4
    assert r["lift_e6"] == 3 * 5 * 10**6 // 16
    r2 = out.loc[(10, 30)]
    assert (r2["n_xy"], r2["n_x"], r2["n_y"]) == (2, 4, 2)
    assert r2["conf_yx_e6"] == 10**6  # C always co-occurs with A
    assert r2["lift_e6"] == 2 * 5 * 10**6 // 8


def test_basket_skew_guard_drops_mega_basket(ray_session):
    import ray.data

    from opentapioca_ray.stages.relational import basket_rules

    rows = [{"o": 1, "i": i} for i in range(50)]  # one huge basket
    rows += [{"o": 2, "i": 1}, {"o": 2, "i": 2},
             {"o": 3, "i": 1}, {"o": 3, "i": 2}]
    out = basket_rules(
        ray.data.from_items(rows), "o", "i", min_support=2, max_basket=10
    ).to_pandas()
    # the 50-item basket is dropped; only (1,2) survives from o2/o3
    assert len(out) == 1
    assert (int(out["x"][0]), int(out["y"][0]), int(out["n_xy"][0])) == (1, 2, 2)
