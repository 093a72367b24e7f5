"""S11: SQLite chat-history store — the serving UI's session log
(`WebUI_Front/app_new.py:19-107`: chats + messages CRUD, recency-sorted
chat list) on the Python stdlib ``sqlite3``.

This is service-layer state, not engine state: one small local database
beside the API process, never touched by any Spark plan.  L4 (recency
sort) lives here — ``list_chats`` orders by last-activity timestamp —
which is why neither appears in the gate workload.

Schema mirrors the reference's two tables: ``chats(session_id, title,
created_at, updated_at)`` and ``messages(id, session_id, role, content,
created_at)``; timestamps are caller-supplied integers so tests are
deterministic and the store never reads a wall clock itself.
"""

from __future__ import annotations

import sqlite3
import threading

_SCHEMA = """
CREATE TABLE IF NOT EXISTS chats (
  session_id TEXT PRIMARY KEY,
  title      TEXT NOT NULL,
  created_at INTEGER NOT NULL,
  updated_at INTEGER NOT NULL
);
CREATE TABLE IF NOT EXISTS messages (
  id         INTEGER PRIMARY KEY AUTOINCREMENT,
  session_id TEXT NOT NULL REFERENCES chats(session_id) ON DELETE CASCADE,
  role       TEXT NOT NULL CHECK (role IN ('user', 'assistant')),
  content    TEXT NOT NULL,
  created_at INTEGER NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_messages_session ON messages(session_id, id);
"""


class ChatHistory:
    """CRUD over the chats/messages tables; safe to share across the
    API server's handler threads — a single lock serializes every call
    (one shared sqlite3 connection means concurrent transactions would
    otherwise interleave, and append's create-chat check is
    check-then-act)."""

    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()
        self._conn.execute("PRAGMA foreign_keys = ON")
        self._conn.executescript(_SCHEMA)

    def _upsert_chat(self, session_id: str, title: str, ts: int) -> None:
        """Create-or-touch the chat row (caller holds lock+transaction)."""
        row = self._conn.execute(
            "SELECT 1 FROM chats WHERE session_id = ?", (session_id,)
        ).fetchone()
        if row is None:
            self._conn.execute(
                "INSERT INTO chats VALUES (?, ?, ?, ?)",
                (session_id, title, ts, ts),
            )
        else:
            self._conn.execute(
                "UPDATE chats SET updated_at = ? WHERE session_id = ?",
                (ts, session_id),
            )

    def _insert_message(self, session_id: str, role: str, content: str, ts: int) -> None:
        self._conn.execute(
            "INSERT INTO messages (session_id, role, content, created_at)"
            " VALUES (?, ?, ?, ?)",
            (session_id, role, content, ts),
        )

    def append(
        self, session_id: str, role: str, content: str, ts: int, title: str | None = None
    ) -> None:
        """Add one message; creates the chat row on first use (titled
        with the first user message unless given, like the reference)."""
        with self._lock, self._conn:
            self._upsert_chat(session_id, title or content[:60], ts)
            self._insert_message(session_id, role, content, ts)

    def append_turn(
        self,
        session_id: str,
        user_content: str,
        assistant_content: str,
        user_ts: int,
        assistant_ts: int,
        title: str | None = None,
    ) -> None:
        """Persist one user/assistant exchange ATOMICALLY: both message
        rows commit together or neither does (`with self._conn` rolls
        the transaction back on any failure), so a mid-pair error —
        locked database, full disk — can never leave an orphaned user
        row breaking the alternating-turn shape that ``messages``
        consumers (quoted-term inheritance, the chat UI) assume."""
        with self._lock, self._conn:
            self._upsert_chat(session_id, title or user_content[:60], assistant_ts)
            self._insert_message(session_id, "user", user_content, user_ts)
            self._insert_message(session_id, "assistant", assistant_content, assistant_ts)

    def messages(self, session_id: str) -> list[tuple[str, str]]:
        """(role, content) in insertion order — the ``history`` payload
        shape the endpoint echoes."""
        with self._lock:
            return self._conn.execute(
            "SELECT role, content FROM messages WHERE session_id = ? ORDER BY id",
            (session_id,),
        ).fetchall()

    def list_chats(self) -> list[tuple[str, str]]:
        """(session_id, title), most recently active first (L4)."""
        with self._lock:
            return self._conn.execute(
                "SELECT session_id, title FROM chats ORDER BY updated_at DESC, session_id"
            ).fetchall()

    def delete_chat(self, session_id: str) -> None:
        with self._lock, self._conn:
            self._conn.execute("DELETE FROM chats WHERE session_id = ?", (session_id,))

    def max_ts(self) -> int:
        """Largest timestamp ever written (0 when empty) — lets a
        restarted caller keep its tick monotonic across process lives."""
        with self._lock:
            row = self._conn.execute(
                "SELECT coalesce(max(updated_at), 0), "
                "(SELECT coalesce(max(created_at), 0) FROM messages) FROM chats"
            ).fetchone()
        return max(row)

    def close(self) -> None:
        self._conn.close()
