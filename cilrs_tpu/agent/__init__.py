"""Closed-loop agent runtime: perception, safety controller, state machines,
autopilot teacher, scenario setup, and the fused world step."""
