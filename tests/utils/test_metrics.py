import numpy as np

from smqtk_indexing_tpu.utils import metrics


class TestHistogramIntersectionDistance:

    def test_identical_histograms(self) -> None:
        h = np.array([0.25, 0.25, 0.5])
        assert metrics.histogram_intersection_distance(h, h) == 0.0

    def test_disjoint_histograms(self) -> None:
        a = np.array([1.0, 0.0])
        b = np.array([0.0, 1.0])
        assert metrics.histogram_intersection_distance(a, b) == 1.0

    def test_matrix_broadcast(self) -> None:
        a = np.array([0.5, 0.5])
        m = np.array([[0.5, 0.5], [1.0, 0.0], [0.0, 1.0]])
        d = metrics.histogram_intersection_distance(a, m)
        np.testing.assert_allclose(d, [0.0, 0.5, 0.5])

    def test_fast_matches_general(self) -> None:
        rng = np.random.default_rng(1)
        a, b = rng.random(16), rng.random(16)
        assert np.isclose(
            metrics.histogram_intersection_distance_fast(a, b),
            metrics.histogram_intersection_distance(a, b))


class TestEuclidean:

    def test_vector_pair(self) -> None:
        assert metrics.euclidean_distance(
            np.array([0.0, 0.0]), np.array([3.0, 4.0])) == 5.0

    def test_rowwise(self) -> None:
        a = np.zeros((2, 2))
        b = np.array([[3.0, 4.0], [0.0, 1.0]])
        np.testing.assert_allclose(
            metrics.euclidean_distance(a, b), [5.0, 1.0])


class TestCosine:

    def test_similarity_identical(self) -> None:
        v = np.array([1.0, 2.0, 3.0])
        assert np.isclose(metrics.cosine_similarity(v, v), 1.0)

    def test_similarity_orthogonal(self) -> None:
        assert np.isclose(
            metrics.cosine_similarity(np.array([1.0, 0.0]),
                                      np.array([0.0, 1.0])), 0.0)

    def test_distance_pos_vectors_range(self) -> None:
        # Orthogonal positive vectors: angular distance 1.0 with the
        # (1 + pos)*arccos/pi scaling.
        d = metrics.cosine_distance(np.array([1.0, 0.0]),
                                    np.array([0.0, 1.0]))
        assert np.isclose(d, 1.0)

    def test_distance_identical_is_zero(self) -> None:
        v = np.array([0.2, 0.8])
        assert np.isclose(metrics.cosine_distance(v, v), 0.0)

    def test_similarity_matrix(self) -> None:
        v = np.array([1.0, 0.0])
        m = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
        np.testing.assert_allclose(
            metrics.cosine_similarity(v, m), [1.0, 0.0, -1.0], atol=1e-12)


class TestHamming:

    def test_small(self) -> None:
        assert metrics.hamming_distance(0b1010, 0b0101) == 4
        assert metrics.hamming_distance(7, 7) == 0

    def test_arbitrary_precision(self) -> None:
        i = 1 << 500
        assert metrics.hamming_distance(i, 0) == 1
        assert metrics.hamming_distance(i | 1, 1) == 1
