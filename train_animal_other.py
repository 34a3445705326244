"""Animal UDA trainer for SynAnimal -> AnimalPose (dog/sheep, 14 keypoints).

The reference train_animal_other.py is byte-identical to train_animal.py
except the per-category eval loaders use dog/sheep (SURVEY.md §2.1); here it
simply reuses the shared trainer with those categories.
"""

from train_animal import build_parser, main

if __name__ == "__main__":
    main(build_parser().parse_args(), eval_categories=("dog", "sheep"))
