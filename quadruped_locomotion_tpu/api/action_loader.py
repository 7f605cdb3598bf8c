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

    def _load_action_decls(self, path: str, root: str) -> None:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for item in doc.get("actions", []) or []:
            a = item.get("action", item)
            if str(a.get("type", "yaml")) != "yaml":
                # python/launch action types are ROS-host concepts; the
                # TPU build only executes declarative yaml scripts.
                continue
            entry = ActionEntry(
                id=str(a["id"]),
                name=str(a.get("name", a["id"])),
                file=os.path.normpath(os.path.join(root, a["file"])),
                type="yaml",
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
