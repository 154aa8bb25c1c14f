"""Small-util golden tests transplanted from the reference suite
(tests/test_common_utils.py str2bool truth table; tests/test_download.py
archive-format map)."""

import pytest

from beta_recsys_tpu.utils.common import DictToObject, str2bool
from beta_recsys_tpu.utils.download import get_format


@pytest.mark.parametrize(
    "value,expected",
    [("yes", True), ("true", True), ("t", True), ("y", True), ("1", True),
     ("TRUE", True), ("no", False), ("false", False), ("f", False),
     ("n", False), ("0", False), ("FALSE", False), (True, True), (False, False)],
)
def test_str2bool(value, expected):
    assert str2bool(value) is expected


def test_str2bool_rejects_garbage():
    with pytest.raises(ValueError):
        str2bool("maybe")


@pytest.mark.parametrize(
    "suffix,fmt",
    [(".zip", "zip"), (".tar.gz", "gztar"), (".tgz", "gztar"),
     (".gz", "gzip"), (".7z", "7z")],
)
def test_archive_format_map(suffix, fmt):
    assert get_format(suffix) == fmt


def test_archive_format_unknown():
    with pytest.raises(ValueError):
        get_format(".rar9")


def test_dict_to_object_nested():
    obj = DictToObject({"a": 1, "b": {"c": 2}})
    assert obj.a == 1
    assert obj.b.c == 2
