"""L4 analog engines: TJM trajectories, MCWF, Lindblad, unitary ensembles."""
