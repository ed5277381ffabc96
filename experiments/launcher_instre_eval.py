"""INSTRE training + evaluation jobs (port of launcher_exp3_instre.py +
launcher_instre_eval.py: instre-s1 @700, instre-s2 @600, both rotation90 TTA)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from collections import OrderedDict

from os2d_tpu.utils import launcher

EVAL_DATASETS = {
    "instre-s1-test": {"scales": "[700.0]",
                       "extra": {"eval.class_image_augmentation": "rotation90"}},
    "instre-s2-test": {"scales": "[600.0]",
                       "extra": {"eval.class_image_augmentation": "rotation90"}},
}

if __name__ == "__main__":
    parser = launcher.create_args_parser()
    parser.add_argument("--model-path", type=str, default="output/instre")
    parser.add_argument("--model-checkpoint", type=str,
                        default="checkpoint_best_model_instre-s1-val_mAP@0.50.pkl")
    parser.add_argument("--backbone-arch", type=str, default="ResNet50")
    parser.add_argument("--train", action="store_true",
                        help="Queue the INSTRE training jobs instead of eval")
    args = parser.parse_args()

    main_command = "python main.py"
    config_path = os.path.dirname(os.path.abspath(__file__))
    config_file = os.path.join(config_path, "config_training.yml")
    log_path = os.path.abspath(os.path.join(config_path, "..", "output/instre"))

    if args.train:
        for i, subset in enumerate(["instre-s1", "instre-s2"]):
            d = OrderedDict()
            d["--config-file"] = config_file
            d["model.backbone_arch"] = args.backbone_arch
            d["train.dataset_name"] = f"{subset}-train"
            d["train.dataset_scale"] = "700.0" if subset == "instre-s1" else "600.0"
            d["eval.dataset_names"] = f'"[\\"{subset}-val\\"]"'
            d["eval.dataset_scales"] = (
                "[700.0]" if subset == "instre-s1" else "[600.0]"
            )
            log_folder = os.path.join(log_path, f"train_{subset}")
            d["output.path"] = log_folder
            launcher.add_job(f"instre-train.{i}.{subset}", log_folder,
                             [main_command + " " + launcher.parameters_to_str(d)])
    else:
        model_path = args.model_path
        if not os.path.isfile(model_path):
            model_path = os.path.join(model_path, args.model_checkpoint)
        for i, (eval_dataset, spec) in enumerate(EVAL_DATASETS.items()):
            d = OrderedDict()
            d["--config-file"] = config_file
            d["model.backbone_arch"] = args.backbone_arch
            d["init.model"] = model_path
            d["train.do_training"] = False
            d["eval.dataset_names"] = f'"[\\"{eval_dataset}\\"]"'
            d["eval.dataset_scales"] = spec["scales"]
            d.update(spec["extra"])
            log_folder = os.path.join(log_path, eval_dataset)
            d["output.path"] = log_folder
            launcher.add_job(f"instre-eval.{i}.{eval_dataset}", log_folder,
                             [main_command + " " + launcher.parameters_to_str(d)],
                             log_file_prefix=f"eval_{eval_dataset}_")

    launcher.launch_all_jobs(args)
