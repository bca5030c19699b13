import pytest

from smqtk_indexing_tpu.utils.iter_validation import check_empty_iterable


class TestCheckEmptyIterable:

    def test_empty_raises_given_exception_without_callback(self) -> None:
        calls = []
        exc = ValueError("custom message")
        with pytest.raises(ValueError, match="custom message"):
            check_empty_iterable(iter(()), calls.append, exc)
        assert calls == []

    def test_nonempty_passes_through_intact(self) -> None:
        received = []
        check_empty_iterable(iter([1, 2, 3]),
                             lambda it: received.extend(it),
                             ValueError("no"))
        assert received == [1, 2, 3]

    def test_generator_input(self) -> None:
        received = []
        check_empty_iterable((x * 2 for x in range(4)),
                             lambda it: received.extend(it),
                             ValueError("no"))
        assert received == [0, 2, 4, 6]
