"""Repo QA utilities (correctness replica, plan audits, scale probes)."""
