from palace_tpu.models.gcn import (
    GCNConfig,
    forward,
    init_params,
    load_torch_state_dict,
    model_inputs_from_features,
    params_from_numpy_state,
    phage_probabilities,
)
