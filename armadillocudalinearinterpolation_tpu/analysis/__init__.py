"""Analysis layer: linear stability via eigenvalues of the map Jacobian."""
