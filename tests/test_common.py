"""Common value types (hwang/common.h parity).

The reference's ``DeviceHandle::operator<`` was a broken strict-weak
ordering (common.h:33-35, ``&&`` across both fields); the first rebuild
traded it for a TypeError (dataclass ``order=True`` compares the enum
members).  These are the regression tests neither version had.
"""

from hwang_tpu.common import (
    CPU_DEVICE,
    TPU_DEVICE,
    DeviceHandle,
    DeviceType,
    HwangError,
    Result,
)


def test_device_handle_ordering_same_type():
    assert DeviceHandle(DeviceType.CPU, 0) < DeviceHandle(DeviceType.CPU, 1)
    assert not (
        DeviceHandle(DeviceType.CPU, 1) < DeviceHandle(DeviceType.CPU, 0)
    )
    assert DeviceHandle(DeviceType.CPU, 1) <= DeviceHandle(DeviceType.CPU, 1)


def test_device_handle_ordering_cross_type():
    # this exact comparison raised TypeError with dataclass order=True
    assert CPU_DEVICE < TPU_DEVICE
    assert DeviceHandle(DeviceType.CPU, 99) < DeviceHandle(DeviceType.GPU, 0)
    assert DeviceHandle(DeviceType.GPU, 0) < DeviceHandle(DeviceType.TPU, 0)


def test_device_handle_strict_weak_ordering():
    handles = [
        DeviceHandle(t, i) for t in DeviceType for i in range(3)
    ]
    # sortable without error, and sorted order is (type.value, id)
    s = sorted(handles)
    assert s == sorted(handles, key=lambda h: (h.type.value, h.id))
    # irreflexive + asymmetric
    for a in handles:
        assert not a < a
        for b in handles:
            assert not (a < b and b < a)


def test_device_handle_equality_and_hash():
    assert DeviceHandle(DeviceType.TPU, 2) == DeviceHandle(DeviceType.TPU, 2)
    assert hash(CPU_DEVICE) == hash(DeviceHandle(DeviceType.CPU, 0))
    assert CPU_DEVICE != TPU_DEVICE


def test_result():
    assert Result()
    err = Result.error("boom")
    assert not err
    try:
        err.raise_if_error()
    except HwangError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("raise_if_error did not raise")
