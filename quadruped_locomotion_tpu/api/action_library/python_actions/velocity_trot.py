"""Python-type action: velocity-following continuous trot.

Executed by the ActionLoader's python branch (like the reference's
``execfile`` of python actions, action_loader.py:172-178): the script
sees ``server`` / ``free_gait_action`` in its namespace and must leave
an ``action`` object behind.
"""

from quadruped_locomotion_tpu.api.continuous_actions import VelocityTrotAction

action = VelocityTrotAction(server, velocity=(0.12, 0.0))  # noqa: F821
