"""Plan layer: tileset/layer/field config model, the field-mapping
compiler, and the end-to-end tile-build pipeline with the MID_ZOOM
impute loop and checkpoint/lineage bookkeeping."""
