import numpy as np

from opentapioca_ray.state.linear import LinearModel, StandardScaler


def test_scaler():
    X = np.array([[1.0, 10.0], [3.0, 10.0]])
    s = StandardScaler().fit(X)
    out = s.transform(X)
    np.testing.assert_allclose(out[:, 0], [-1.0, 1.0])
    np.testing.assert_allclose(out[:, 1], [0.0, 0.0])  # zero-var column


def test_linear_separable():
    rng = np.random.RandomState(0)
    X = np.vstack([rng.randn(50, 2) + [3, 3], rng.randn(50, 2) - [3, 3]])
    y = np.array([1] * 50 + [0] * 50)
    model = LinearModel(C=0.1, max_iter=300).fit(X, y)
    assert (model.predict(X) == y).mean() == 1.0
    scores = model.decision_function(X)
    assert scores[:50].min() > 0 and scores[50:].max() < 0


def test_class_imbalance_balanced():
    rng = np.random.RandomState(1)
    X = np.vstack([rng.randn(5, 2) + [2, 2], rng.randn(95, 2) - [2, 2]])
    y = np.array([1] * 5 + [0] * 95)
    model = LinearModel(C=0.1, max_iter=300).fit(X, y)
    # balanced weighting must not collapse to the majority class
    assert model.predict(X)[:5].sum() == 5


def test_save_load_roundtrip(tmp_path):
    X = np.array([[0.0, 1.0], [1.0, 0.0], [2.0, 2.0], [-1.0, -2.0]])
    y = np.array([1, 0, 1, 0])
    model = LinearModel(C=1.0, max_iter=200).fit(X, y)
    f = str(tmp_path / "m.json")
    model.save(f)
    loaded = LinearModel.load(f)
    np.testing.assert_allclose(
        model.decision_function(X), loaded.decision_function(X)
    )
