"""DataFrame operators: sketch, candidate pairs, edges, connected components,
postprocess, dedup suite, ANN, multimodal plumbing."""
