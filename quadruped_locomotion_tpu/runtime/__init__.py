"""Runtime layer: HAL, shared-memory transport, controller manager.

≙ the reference's ros_control/EtherCAT runtime (SURVEY.md §2.6) —
see :mod:`.hal`, :mod:`.shm`, :mod:`.manager`.
"""

from . import hal, manager  # noqa: F401
