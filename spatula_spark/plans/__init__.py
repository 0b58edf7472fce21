"""Logical plan layer: PageSpec registry + the iterative wave driver."""
