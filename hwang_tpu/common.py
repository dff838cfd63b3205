"""Common value types shared across all layers.

Parity notes (vs reference scanner-research/hwang):
  - DeviceType / DeviceHandle mirror hwang/common.h:20-50.  The reference's
    ``DeviceHandle::operator<`` is a broken strict-weak-ordering (uses ``&&``
    across both fields, common.h:33-35); here ordering is explicit
    lexicographic order over ``(type.value, id)`` (dataclass ``order=True``
    would compare the enum members themselves, which raises TypeError for
    handles of different types).
  - Result mirrors hwang/common.h:54-68 (``Result{ok, message}``).  Library
    code never hard-exits; errors propagate as Result / HwangError.
"""

from __future__ import annotations

import dataclasses
import enum
import functools


class DeviceType(enum.Enum):
    """Where decode output lands. Reference: hwang/common.h:20-23."""

    CPU = 0
    GPU = 1  # kept for API parity; unsupported on TPU hosts
    TPU = 2  # TPU-native addition: frames land in HBM as jax.Arrays


@functools.total_ordering
@dataclasses.dataclass(frozen=True)
class DeviceHandle:
    """A (device type, device id) pair. Reference: hwang/common.h:25-50."""

    type: DeviceType = DeviceType.CPU
    id: int = 0

    def __lt__(self, other: "DeviceHandle"):
        if not isinstance(other, DeviceHandle):
            return NotImplemented
        return (self.type.value, self.id) < (other.type.value, other.id)

    def can_copy_to(self, other: "DeviceHandle") -> bool:
        return True

    def is_same_address_space(self, other: "DeviceHandle") -> bool:
        if self.type == DeviceType.CPU and other.type == DeviceType.CPU:
            return True
        return self.type == other.type and self.id == other.id


CPU_DEVICE = DeviceHandle(DeviceType.CPU, 0)
TPU_DEVICE = DeviceHandle(DeviceType.TPU, 0)


@dataclasses.dataclass
class Result:
    """Error-or-ok result type. Reference: hwang/common.h:54-62."""

    ok: bool = True
    message: str = ""

    def __bool__(self) -> bool:
        return self.ok

    @staticmethod
    def error(message: str) -> "Result":
        return Result(ok=False, message=message)

    def raise_if_error(self) -> None:
        if not self.ok:
            raise HwangError(self.message)


class HwangError(RuntimeError):
    """Raised by the Python API when a Result carries an error.

    Mirrors the pybind translation of Result -> RuntimeError
    (reference hwang/hwang_python.cpp:62-70).
    """
