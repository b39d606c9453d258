"""Materialization status records.

Each non-ephemeral op gets a small JSON status document in the result store,
embedding the op's full serialized upstream graph so any process pointing at
the same store can rehydrate the pipeline from a UUID alone (parity with the
reference's ``runners/op_status.py:13-39`` and ``uuid_to_op`` rehydration,
``local_arrow_runner.py:250-269``)."""

from __future__ import annotations

import datetime
from enum import Enum
from typing import Any, Optional

from pydantic import BaseModel


class OpState(str, Enum):
    NEW = "new"
    PENDING = "pending"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"
    EPHEMERAL = "ephemeral"


def utcnow() -> str:
    return datetime.datetime.now(datetime.timezone.utc).isoformat()


class OpStatus(BaseModel):
    uuid: str
    state: OpState = OpState.NEW
    started_at: Optional[str] = None
    completed_at: Optional[str] = None
    error: Optional[str] = None
    graph: Optional[dict[str, Any]] = None  # serialized upstream graph

    def to_json(self) -> str:
        return self.model_dump_json()

    @classmethod
    def from_json(cls, blob: str) -> "OpStatus":
        return cls.model_validate_json(blob)
