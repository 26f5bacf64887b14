"""Ensembles (L5): NVT/NVE bookkeeping lives in the step itself
(thermostat + global values); this package holds the grand-canonical
machinery (reference: /root/reference/src/ensemble/)."""
