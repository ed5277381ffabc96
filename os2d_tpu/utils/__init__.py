from .logger import (
    setup_logger,
    init_log,
    log_meters,
    print_meters,
    add_to_meters_in_dict,
    time_since,
    checkpoint_model,
    load_checkpoint,
    set_random_seed,
)
