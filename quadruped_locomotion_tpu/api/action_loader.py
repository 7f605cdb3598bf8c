"""Action / collection registry and loader.

≙ the reference's ``free_gait_action_loader`` (SURVEY.md §2.7): a ROS
node that discovers action and collection declarations from packages and
serves ``list_actions`` / ``list_collections`` / ``send_action`` /
``preview_action`` / ``send_action_sequence`` / ``update``
(``free_gait_action_loader/bin/free_gait_action_loader/action_loader.py:40-46``,
declaration schema in ``my_actions/actions/test.yaml`` and
``my_actions/collections/test_collections.yaml``).

TPU-native re-design: no ROS services — the registry is a plain object;
"send" compiles the YAML motion script to a :class:`StepSchedule` and
runs the jitted closed-loop executor; "preview" runs the kinematic
batch-preview scan (≙ BatchExecutor behind ``preview_action``).

Declaration files keep the reference's schema so existing action
libraries translate directly:

.. code-block:: yaml

    actions:
      - action: {id: "1", name: stand up, file: motion_scripts/standup.yaml,
                 type: yaml, description: robot stand}
    collections:
      - collection: {id: "1", name: walk_demo, actions: ["1", "2"],
                     is_sequence: True}
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterable

import yaml

from ..planning.steps import StepSchedule
from . import actions as actions_mod


@dataclasses.dataclass(frozen=True)
class ActionEntry:
    """One declared action (≙ ``action_handling.ActionEntry``)."""

    id: str
    name: str
    file: str  # absolute path to the motion script
    type: str = "yaml"
    description: str = ""


@dataclasses.dataclass(frozen=True)
class CollectionEntry:
    """Named group of actions (≙ ``collection_handling.Collection``)."""

    id: str
    name: str
    action_ids: tuple[str, ...]
    is_sequence: bool = False


class ActionRegistry:
    """Discovers and serves actions/collections from declaration dirs.

    ``roots`` are directories structured like the reference's
    ``my_actions`` package: ``actions/*.yaml`` declarations,
    ``collections/*.yaml``, and ``motion_scripts/*.yaml`` scripts. A
    root with no ``actions/`` subdir is treated as a bare directory of
    motion scripts (each becomes an action with id = filename stem).
    """

    def __init__(self, roots: Iterable[str] | None = None):
        self._roots: list[str] = []
        self.actions: dict[str, ActionEntry] = {}
        self.collections: dict[str, CollectionEntry] = {}
        for r in roots or []:
            self.add_root(r)

    # -- discovery (≙ ActionLoader.update_actions) ----------------------

    def add_root(self, root: str) -> None:
        self._roots.append(os.path.abspath(root))
        self.update()

    def update(self) -> None:
        """Re-scan all roots (≙ the loader's ``update`` service)."""
        self.actions.clear()
        self.collections.clear()
        for root in self._roots:
            decl_dir = os.path.join(root, "actions")
            if os.path.isdir(decl_dir):
                for fn in sorted(os.listdir(decl_dir)):
                    if fn.endswith((".yaml", ".yml")):
                        self._load_action_decls(
                            os.path.join(decl_dir, fn), root
                        )
                coll_dir = os.path.join(root, "collections")
                if os.path.isdir(coll_dir):
                    for fn in sorted(os.listdir(coll_dir)):
                        if fn.endswith((".yaml", ".yml")):
                            self._load_collection_decls(
                                os.path.join(coll_dir, fn)
                            )
            else:  # bare directory of motion scripts
                for fn in sorted(os.listdir(root)):
                    if fn.endswith((".yaml", ".yml")):
                        stem = os.path.splitext(fn)[0]
                        self.actions[stem] = ActionEntry(
                            id=stem,
                            name=stem.replace("_", " "),
                            file=os.path.join(root, fn),
                        )

    #: action types the loader can execute (≙ action_handling.ActionType)
    TYPES = ("yaml", "combined_yaml", "python", "launch")

    def _load_action_decls(self, path: str, root: str) -> None:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for item in doc.get("actions", []) or []:
            a = item.get("action", item)
            atype = str(a.get("type", "yaml"))
            if atype not in self.TYPES:
                continue
            entry = ActionEntry(
                id=str(a["id"]),
                name=str(a.get("name", a["id"])),
                file=os.path.normpath(os.path.join(root, a["file"])),
                type=atype,
                description=str(a.get("description", "")),
            )
            self.actions[entry.id] = entry

    def _load_collection_decls(self, path: str) -> None:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for item in doc.get("collections", []) or []:
            c = item.get("collection", item)
            entry = CollectionEntry(
                id=str(c["id"]),
                name=str(c.get("name", c["id"])),
                action_ids=tuple(str(x) for x in c.get("actions", [])),
                is_sequence=bool(c.get("is_sequence", False)),
            )
            self.collections[entry.id] = entry

    # -- queries (≙ list_actions / list_collections srvs) ---------------

    def list_actions(self, collection_id: str | None = None):
        if collection_id is None:
            return sorted(self.actions.values(), key=lambda a: a.id)
        coll = self.collections[collection_id]
        return [self.actions[i] for i in coll.action_ids if i in self.actions]

    def list_collections(self):
        return sorted(self.collections.values(), key=lambda c: c.id)

    # -- execution (≙ send_action / preview_action srvs) ----------------

    def compile(self, action_id: str, base_pos, base_quat, feet_world) -> StepSchedule:
        """Motion script → StepSchedule against the given robot state."""
        entry = self.actions[action_id]
        return actions_mod.load_action(
            entry.file, base_pos, base_quat, feet_world
        )

    def compile_sequence(
        self, collection_id: str, base_pos, base_quat, feet_world
    ) -> list[StepSchedule]:
        """≙ ``send_action_sequence``: the schedules of a sequence
        collection, in order (executed back-to-back by the caller, each
        re-resolved against the state at its start by re-calling
        :meth:`compile` if frame adaptation matters)."""
        coll = self.collections[collection_id]
        if not coll.is_sequence:
            raise ValueError(f"collection {collection_id} is not a sequence")
        return [
            self.compile(a, base_pos, base_quat, feet_world)
            for a in coll.action_ids
        ]


def default_registry() -> ActionRegistry:
    """Registry over the bundled action library (≙ my_actions)."""
    here = os.path.dirname(__file__)
    return ActionRegistry([os.path.join(here, "action_library")])


class ActionLoader:
    """Executes registry actions through the lifecycle state machine
    against a live :class:`~..runtime.action_server.FreeGaitActionServer`
    — ≙ the reference's ActionLoader node (``action_loader.py:82-197``):
    one current action at a time, per-type construction
    (yaml/combined_yaml/python/launch), callback registration, start when
    INITIALIZED, and sequence chaining from the done callback.

    The reference's loader spins ROS; here the host pumps
    :meth:`pump` (each pump = one server planner tick + subprocess
    polling), so lifecycle transitions stay deterministic.
    """

    def __init__(self, server, registry: ActionRegistry | None = None):
        from . import action as action_mod

        self._A = action_mod
        self.server = server
        self.registry = registry or default_registry()
        self.action = None  # the current ActionBase
        self.action_sequence_queue: list[str] = []
        self.state_log: list[int] = []  # lifecycle transitions observed

    # -- ≙ send_action service ------------------------------------------

    def send_action(self, action_id: str):
        """Load + start the action; returns the live ActionBase (raises
        KeyError for unknown ids ≙ RESULT_NOT_FOUND).

        Entering this public service path purges any pending action
        sequence (≙ the reference's per-service purge,
        ``action_loader.py:71/79/85``) — interrupting a running sequence
        with a direct send must not leave stale queued ids that would
        resume executing when the new action completes. The sequence
        chainer uses :meth:`_send_action_internal` to keep its queue.
        """
        self.action_sequence_queue = []
        return self._send_action_internal(action_id)

    def _send_action_internal(self, action_id: str):
        self.reset()
        entry = self.registry.actions[action_id]
        A = self._A
        if entry.type == "yaml":
            with open(entry.file) as f:
                doc = yaml.safe_load(f)
            self.action = A.SimpleAction(self.server, doc)
        elif entry.type == "combined_yaml":
            act = A.CombinedYamlAction(self.server)
            act.set_goal_from_file(entry.file)
            self.action = act
        elif entry.type == "python":
            self.action = self._load_python_action(entry.file)
        elif entry.type == "launch":
            self.action = A.SubprocessAction(self.server, [entry.file])
        else:  # pragma: no cover — filtered at discovery
            raise ValueError(entry.type)

        self.action.register_callback(
            self._feedback_callback, self._done_callback
        )
        if self.action.state == A.ActionState.INITIALIZED:
            self.action.start()
        return self.action

    def _load_python_action(self, file_path: str):
        """≙ _load_python_action (:172-178): execute the script, which
        must leave an ``action`` object behind. The script sees
        ``server``, ``action_loader``, and the :mod:`.action` API."""
        ns = {
            "server": self.server,
            "action_loader": self,
            "free_gait_action": self._A,
        }
        with open(file_path) as f:
            code = f.read()
        exec(compile(code, file_path, "exec"), ns)
        if "action" not in ns:
            raise ValueError(f"{file_path} did not define `action`")
        return ns["action"]

    # -- ≙ send_action_sequence service ---------------------------------

    def send_action_sequence(self, action_ids) -> None:
        """Run actions back-to-back: each DONE triggers the next
        (≙ _load_next_action_in_sequence, :198-207)."""
        ids = list(action_ids)
        if not ids:
            return
        self._send_action_internal(ids[0])
        self.action_sequence_queue = ids[1:]

    # -- pumping ---------------------------------------------------------

    def pump(self, n_ticks: int = 1) -> None:
        """Advance the server + poll process actions."""
        for _ in range(n_ticks):
            self.server.tick()
            if self.action is not None and hasattr(self.action, "poll"):
                self.action.poll()

    def pump_until(self, states, max_ticks: int = 20_000) -> bool:
        """Pump until the current action reaches one of ``states``."""
        if not isinstance(states, (list, tuple, set)):
            states = (states,)
        for _ in range(max_ticks):
            if self.action is not None and self.action.state in states:
                return True
            self.pump()
        return self.action is not None and self.action.state in states

    # -- callbacks / teardown -------------------------------------------

    def _feedback_callback(self) -> None:
        if self.action is not None:
            self.state_log.append(self.action.state)

    def _done_callback(self) -> None:
        if self.action is not None:
            self.state_log.append(self.action.state)
        if self.action_sequence_queue:
            if (
                self.action is not None
                and self.action.state == self._A.ActionState.DONE
            ):
                next_id = self.action_sequence_queue.pop(0)
                try:
                    self._send_action_internal(next_id)
                except Exception:  # noqa: BLE001 — unknown/broken id
                    # ≙ _load_next_action_in_sequence's purge-on-failure
                    # (:205-207): surface via state, don't raise from
                    # deep inside server.tick().
                    self.action_sequence_queue = []
                    self.action = None
                    self.state_log.append(self._A.ActionState.ERROR)
            else:  # error: purge the rest (≙ :205-207)
                self.action_sequence_queue = []

    def reset(self) -> None:
        """≙ ActionLoader.reset: stop and drop the current action."""
        if self.action is not None and self.action.state in (
            self._A.ActionState.PENDING,
            self._A.ActionState.ACTIVE,
            self._A.ActionState.IDLE,
        ):
            self.action.stop()
        self.action = None
