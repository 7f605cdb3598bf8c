"""Execution-control runtime: the free_gait action server, TPU-native.

≙ the reference's runtime interactivity layer — ``FreeGaitActionServer``
(``free_gait_ros/src/FreeGaitActionServer.cpp:93-187``: goal merge with
trailing-BaseAuto replacement :110-117, feedback :148-187),
``Executor::stop``'s three preemption modes
(``free_gait_core/src/executor/Executor.cpp:139-159``) and
``Executor::pause`` (:134-137), and the brain node's stop/pause services
(``free_gait_ros/test/action_server_test.cpp:76-84, 204-267``).

TPU-native re-design: the executor is the jitted scan tick
(:mod:`..rollout.script_loop`), compiled ONCE over a capacity-padded
:class:`~..planning.steps.StepSchedule`; all runtime interactivity is
host-side mutation of plain data between ticks:

* a **goal** compiles to schedule rows (``goal_to_schedule``) appended to
  the padded buffer; a live ``active_steps`` scalar (dynamic jit input)
  tells the executor how many rows exist — growing the queue never
  recompiles;
* **stop** manipulates ``active_steps`` / the executor clock per the
  stored preemption type (clearNextSteps ↔ truncate after the current
  row; clear ↔ truncate AND expire the current step);
* **pause** feeds ``dt = 0`` ticks: executor time freezes, outputs
  repeat, and the balance controller keeps stabilizing on them —
  exactly the reference's paused executor with a live controller;
* **feedback** is derived from the executor state each tick and handed
  to per-goal callbacks; results fire as goals complete.

The server drives the on-device plant through
:func:`~..rollout.script_loop.planner_tick` (100 Hz planner + 4× 400 Hz
control substeps), i.e. it plays the role of the reference's
``action_server_test_node`` main loop against Gazebo.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..api import messages as msg
from ..control.locomotion import ControllerParams
from ..planning import steps as steps_mod
from ..planning.steps import BASE_AUTO, LEG_NONE, StepSchedule
from ..rollout import script_loop as sl
from ..types import RobotModel

LEG_NAMES = ("LF_LEG", "RF_LEG", "RH_LEG", "LH_LEG")


def _sched_slice(s: StepSchedule, lo: int, hi: int) -> StepSchedule:
    return jax.tree_util.tree_map(lambda a: a[lo:hi], s)


def _sched_concat(parts: list[StepSchedule]) -> StepSchedule:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts
    )


@dataclasses.dataclass
class _Goal:
    goal_id: int
    first_row: int  # row index of the goal's first step
    n_steps: int
    done: bool = False
    feedback_cb: Callable[[msg.ExecuteStepsFeedback], None] | None = None
    result_cb: Callable[[msg.ExecuteStepsResult], None] | None = None
    result: msg.ExecuteStepsResult | None = None


class FreeGaitActionServer:
    """Host-side goal server around the jitted schedule executor."""

    def __init__(
        self,
        model: RobotModel,
        params: ControllerParams | None = None,
        capacity: int = 16,
        height: float = 0.4,
        qp_iters: int = 15,
        state: sl.ScriptState | None = None,
    ):
        self.model = model
        self.params = params or ControllerParams.defaults()
        self.capacity = capacity
        self.state = state or sl.init_script_state(model, None, height=height)
        # padded schedule buffer; rows < active are live
        self._sched = StepSchedule.create(capacity)
        self._active = 0
        self._pad_row = _sched_slice(StepSchedule.create(1), 0, 1)
        self.paused = False
        # ≙ Executor preemptionType_, set by each accepted goal
        self.preemption_type = msg.PREEMPT_STEP
        self._goals: list[_Goal] = []
        self._next_goal_id = 0
        self.ticks = 0
        self.last_feedback: msg.ExecuteStepsFeedback | None = None

        def tick_fn(mdl, sched, ss, active, dt):
            return sl.planner_tick(
                mdl,
                self.params,
                sched,
                ss,
                qp_iters=qp_iters,
                active_steps=active,
                dt=dt,
            )

        # model is a jit *argument* (not a closure) so live model edits —
        # SetLimbConfigure flipping IK branches — apply without recompiles.
        self._tick_fn = jax.jit(tick_fn)

    # ------------------------------------------------------------------
    # queue bookkeeping
    # ------------------------------------------------------------------

    @property
    def current_row(self) -> int:
        return int(self.state.exec.step_index)

    @property
    def queue_size(self) -> int:
        """Remaining steps including the current one (≙ StepQueue::size)."""
        if bool(self.state.exec.done):
            return 0
        return max(0, self._active - max(self.current_row, 0))

    def _row_is_pure_base_auto(self, row: int) -> bool:
        lm = np.asarray(self._sched.leg_motion_type[row])
        bm = int(self._sched.base_mode[row])
        return bool((lm == LEG_NONE).all() and bm == BASE_AUTO)

    def _set_rows(self, rows: StepSchedule, active: int) -> None:
        """Install live rows (≤ capacity) into the padded device buffer."""
        n = active
        assert n <= self.capacity, "schedule buffer overflow"
        pad = [self._pad_row] * (self.capacity - n)
        parts = ([_sched_slice(rows, 0, n)] + pad) if n else pad
        self._sched = _sched_concat(parts) if len(parts) > 1 else parts[0]
        self._active = n

    def _compact(self, need: int) -> None:
        """Drop fully-executed rows before the current one to make room."""
        cur = max(self.current_row, 0)
        if self._active + need <= self.capacity or cur == 0:
            return
        live = _sched_slice(self._sched, cur, self._active)
        n_live = self._active - cur
        self._set_rows(live, n_live)
        self.state = self.state.replace(
            exec=self.state.exec.replace(
                step_index=self.state.exec.step_index - cur
            )
        )
        for g in self._goals:
            g.first_row -= cur

    # ------------------------------------------------------------------
    # the action API
    # ------------------------------------------------------------------

    def submit_goal(
        self,
        goal: msg.ExecuteStepsGoal,
        feedback_cb=None,
        result_cb=None,
    ) -> int:
        """Accept an ExecuteStepsGoal (mid-run ok) — ≙ goalCallback
        (``FreeGaitActionServer.cpp:93-138``). Returns a goal id."""
        sim = self.state.sim
        rows = msg.goal_to_schedule(
            goal,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            sim.feet_world,
        )
        return self.submit_rows(
            rows, goal.preempt, feedback_cb=feedback_cb, result_cb=result_cb
        )

    def submit_rows(
        self,
        rows: StepSchedule,
        preempt: int = msg.PREEMPT_STEP,
        feedback_cb=None,
        result_cb=None,
    ) -> int:
        """Append precompiled schedule rows as a goal (the shared back end
        of :meth:`submit_goal` and the action-loader services)."""
        n_new = rows.num_steps

        # Trailing pure-BaseAuto replacement (:110-117): if the queue has
        # ≥ 2 steps and its LAST (not yet executing) step is a pure
        # base_auto, drop it for a smooth merge into the new goal.
        cur = self.current_row
        if (
            self.queue_size >= 2
            and self._active - 1 > max(cur, 0)
            and self._row_is_pure_base_auto(self._active - 1)
        ):
            last_goal = self._goals[-1] if self._goals else None
            if last_goal is not None and not last_goal.done:
                last_goal.n_steps -= 1
            self._active -= 1

        self._compact(n_new)
        live = _sched_slice(self._sched, 0, self._active)
        merged = (
            _sched_concat([live, rows]) if self._active else rows
        )
        was_done = bool(self.state.exec.done)
        self._set_rows(merged, self._active + n_new)

        # a finished executor re-arms on new rows
        if was_done:
            self.state = self.state.replace(
                exec=self.state.exec.replace(done=jnp.asarray(False))
            )

        self.preemption_type = preempt
        g = _Goal(
            goal_id=self._next_goal_id,
            first_row=self._active - n_new,
            n_steps=n_new,
            feedback_cb=feedback_cb,
            result_cb=result_cb,
        )
        self._next_goal_id += 1
        self._goals.append(g)
        return g.goal_id

    def stop(self) -> None:
        """Stop execution per the stored preemption type — ≙
        Executor::stop (``Executor.cpp:139-159``)."""
        if self.preemption_type == msg.PREEMPT_NO:
            return
        cur = self.current_row
        if self._active == 0 or bool(self.state.exec.done):
            return
        if self.preemption_type == msg.PREEMPT_STEP:
            # clearNextSteps: keep the current step, drop the rest.
            if self.queue_size <= 1:
                return
            self._active = max(cur + 1, 1)
        elif self.preemption_type == msg.PREEMPT_IMMEDIATE:
            # clear(): drop everything including the current step — the
            # executor expires instantly and idles on the held state.
            self._active = max(cur, 0)
            self.state = self.state.replace(
                exec=self.state.exec.replace(
                    time_in_step=jnp.asarray(
                        jnp.inf, self.state.sim.feet_world.dtype
                    )
                )
            )
        self._finalize_goals(preempted=True)

    def pause(self, should_pause: bool = True) -> None:
        """≙ Executor::pause (:134-137)."""
        self.paused = should_pause

    # ------------------------------------------------------------------
    # loader / configuration services
    # ------------------------------------------------------------------

    def send_action(
        self,
        action_id: str,
        registry=None,
        preempt: int = msg.PREEMPT_STEP,
        feedback_cb=None,
        result_cb=None,
    ) -> int:
        """≙ ``SendAction.srv``: compile a registry action against the
        current robot state and queue it. Returns the goal id (the
        service's 'successfully started' result maps to not raising)."""
        from ..api.action_loader import default_registry

        registry = registry or default_registry()
        sim = self.state.sim
        rows = registry.compile(
            action_id,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            sim.feet_world,
        )
        return self.submit_rows(
            rows, preempt, feedback_cb=feedback_cb, result_cb=result_cb
        )

    def send_action_sequence(
        self,
        action_ids,
        registry=None,
        preempt: int = msg.PREEMPT_STEP,
    ) -> list[int]:
        """≙ ``SendActionSequence.srv``: queue several actions
        back-to-back, each as its own goal (its own result). Also accepts
        a sequence-collection id in place of the list."""
        from ..api.action_loader import default_registry

        registry = registry or default_registry()
        if isinstance(action_ids, str):
            coll = registry.collections[action_ids]
            action_ids = list(coll.action_ids)
        return [
            self.send_action(a, registry=registry, preempt=preempt)
            for a in action_ids
        ]

    def set_limb_configure(self, configure: str) -> bool:
        """≙ ``SetLimbConfigure.srv`` → ``QuadrupedState::setLimbConfigure``
        (``quadruped_state.cpp:369-399``): switch the per-leg IK branch
        ('<<', '<>', '><', '>>'). Applies on the next tick (the model is
        a jit argument, so no recompile).

        Intentional improvement over the reference: unknown configure
        strings return False here, whereas ``setLimbConfigure`` returns
        true unconditionally and silently ignores them."""
        from ..types import limb_configure_branches

        try:
            branch = limb_configure_branches(configure)
        except KeyError:
            return False
        self.model = self.model.replace(ik_branch=branch)
        return True

    # ------------------------------------------------------------------
    # the runtime loop
    # ------------------------------------------------------------------

    def tick(self) -> msg.ExecuteStepsFeedback | None:
        """One 100 Hz planner tick (+ 400 Hz control substeps) and one
        feedback publication — ≙ the ActionServerThread body
        (``action_server_test.cpp:100-176``) + publishFeedback."""
        dtype = self.state.sim.feet_world.dtype
        dt = jnp.asarray(0.0 if self.paused else sl.PLANNER_DT, dtype)
        self.state, _kkt = self._tick_fn(
            self.model,
            self._sched,
            self.state,
            jnp.asarray(self._active, jnp.int32),
            dt,
        )
        self.ticks += 1
        self._finalize_goals()
        fb = self._build_feedback()
        self.last_feedback = fb
        if fb is not None:
            # snapshot: a feedback callback may submit a new goal (the
            # continuous-action continuation pattern); goals appended
            # mid-delivery must not receive this tick's stale feedback
            for g in list(self._goals):
                if not g.done and g.feedback_cb is not None:
                    g.feedback_cb(fb)
        return fb

    def run(self, n_ticks: int) -> None:
        for _ in range(n_ticks):
            self.tick()

    def run_until_done(self, max_ticks: int = 10_000) -> None:
        for _ in range(max_ticks):
            self.tick()
            if bool(self.state.exec.done):
                return

    # ------------------------------------------------------------------
    # feedback / results
    # ------------------------------------------------------------------

    def _goal_of_row(self, row: int) -> _Goal | None:
        for g in self._goals:
            if g.first_row <= row < g.first_row + g.n_steps:
                return g
        return None

    def _finalize_goals(self, preempted: bool = False) -> None:
        # Decide every goal's fate against ONE consistent snapshot first,
        # then fire the callbacks: a result_cb may re-enter submit_rows/
        # _compact (the continuous-action continuation pattern), which
        # shifts first_row/step_index mid-loop and would falsely finalize
        # in-flight goals against stale row numbers.
        cur = self.current_row
        done = bool(self.state.exec.done)
        fire: list[_Goal] = []
        for g in self._goals:
            if g.done:
                continue
            last = g.first_row + g.n_steps - 1
            finished = cur > last or (done and cur >= last)
            if preempted and not finished:
                # steps at/after the cut are gone
                if g.first_row + g.n_steps > self._active:
                    g.result = msg.ExecuteStepsResult(
                        status=msg.RESULT_PREEMPTED, goal_id=g.goal_id
                    )
                    g.done = True
            elif finished:
                g.result = msg.ExecuteStepsResult(
                    status=msg.RESULT_SUCCEEDED, goal_id=g.goal_id
                )
                g.done = True
            if g.done and g.result_cb is not None:
                fire.append(g)
        for g in fire:
            g.result_cb(g.result)

    def _build_feedback(self) -> msg.ExecuteStepsFeedback | None:
        """≙ publishFeedback (``FreeGaitActionServer.cpp:148-187``)."""
        cur = self.current_row
        if cur < 0 or self._active == 0:
            return None
        es = self.state.exec
        goal = self._goal_of_row(min(cur, self._active - 1))
        duration = float(es.step_duration)
        t = float(es.time_in_step)
        phase = 0.0 if duration <= 0 else min(t / duration, 1.0)
        branches: list[str] = []
        if not bool(es.done):
            lm = np.asarray(es.leg_motion)
            branches = [
                LEG_NAMES[i] for i in range(4) if lm[i] != LEG_NONE
            ]
            row = min(cur, self.capacity - 1)
            if int(self._sched.base_mode[row]) != steps_mod.BASE_NONE:
                branches.append("base")
        status = (
            msg.PROGRESS_PAUSED if self.paused else msg.PROGRESS_EXECUTING
        )
        return msg.ExecuteStepsFeedback(
            step_id=f"step_{cur}",
            step_number=(cur - goal.first_row + 1) if goal else 0,
            number_of_steps_in_goal=goal.n_steps if goal else 0,
            queue_size=self.queue_size,
            status=status,
            duration=duration,
            phase=phase,
            active_branches=branches,
        )

    def result_of(self, goal_id: int) -> msg.ExecuteStepsResult | None:
        for g in self._goals:
            if g.goal_id == goal_id:
                return g.result
        return None
