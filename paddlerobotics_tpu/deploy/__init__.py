"""Deployment: open-loop Bezier gait, state estimation, policy export,
and the real-time control loop — rebuilds of ETGRL/deployment/."""
