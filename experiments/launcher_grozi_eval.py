"""Evaluation of trained models on the GroZi/retail test suite.

Port of experiments/launcher_grozi_eval.py:1-140: per-dataset eval scales
(grozi @1280, dairy @3500, paste-v @3500, paste-f @2000 + rotation90 TTA).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from collections import OrderedDict

from os2d_tpu.utils import launcher

EVAL_DATASETS = {
    "grozi-val-new-cl": {"scales": "[1280.0]", "extra": {}},
    "grozi-val-old-cl": {"scales": "[1280.0]", "extra": {}},
    "dairy": {"scales": "[3500.0]", "extra": {}},
    "paste-v": {"scales": "[3500.0]", "extra": {}},
    "paste-f": {"scales": "[2000.0]",
                "extra": {"eval.class_image_augmentation": "rotation90"}},
}

if __name__ == "__main__":
    parser = launcher.create_args_parser()
    parser.add_argument("--model-path", type=str, required=False,
                        default="output/exp1/exp1.8.lossRLL_remap_invFullAffine_initTranform_zeroLocLoss_seed0_ResNet50_init_imageNetCaffe2",
                        help="Folder or file of the model to evaluate")
    parser.add_argument("--model-checkpoint", type=str,
                        default="checkpoint_best_model_grozi-val-new-cl_mAP@0.50.pkl")
    parser.add_argument("--backbone-arch", type=str, default="ResNet50")
    parser.add_argument("--v1", action="store_true",
                        help="Evaluate a v1 model (simplified affine)")
    args = parser.parse_args()

    main_command = "python main.py"
    config_path = os.path.dirname(os.path.abspath(__file__))
    log_path = os.path.abspath(os.path.join(config_path, "..", "output/eval"))

    model_path = args.model_path
    if not os.path.isfile(model_path):
        model_path = os.path.join(model_path, args.model_checkpoint)

    for i, (eval_dataset, spec) in enumerate(EVAL_DATASETS.items()):
        job_name = f"eval.{i}.{eval_dataset}"
        d = OrderedDict()
        d["--config-file"] = os.path.join(config_path, "config_training.yml")
        d["model.backbone_arch"] = args.backbone_arch
        if args.v1:
            d["model.use_inverse_geom_model"] = False
            d["model.use_simplified_affine_model"] = True
        else:
            d["model.use_inverse_geom_model"] = True
            d["model.use_simplified_affine_model"] = False
        d["init.model"] = model_path
        d["train.do_training"] = False
        d["eval.dataset_names"] = f'"[\\"{eval_dataset}\\"]"'
        d["eval.dataset_scales"] = spec["scales"]
        d.update(spec["extra"])
        log_folder = os.path.join(log_path, eval_dataset)
        d["output.path"] = log_folder
        launcher.add_job(
            job_name, log_folder,
            [main_command + " " + launcher.parameters_to_str(d)],
            log_file_prefix=f"eval_{eval_dataset}_",
        )

    launcher.launch_all_jobs(args)
