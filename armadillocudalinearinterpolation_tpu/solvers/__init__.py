"""Solver layer: Newton fixed-point iteration and convergence criteria."""
