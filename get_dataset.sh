#!/bin/sh
# Download the four synthetic-animal archives (JHU mirror) into
# animal_data/synthetic_animal/ — same layout the datasets expect.
Root=http://www.cs.jhu.edu/~qiuwch/animal/
mkdir -p animal_data/synthetic_animal
wget -c $Root/synthetic_animal/horse_combineds5r5_texture.zip -O animal_data/synthetic_animal/horse_combineds5r5_texture.zip
wget -c $Root/synthetic_animal/tiger_combineds5r5_texture.zip -O animal_data/synthetic_animal/tiger_combineds5r5_texture.zip
wget -c $Root/synthetic_animal/sheep_combineds5r5_texture.zip -O animal_data/synthetic_animal/sheep_combineds5r5_texture.zip
wget -c $Root/synthetic_animal/hound_combineds5r5_texture.zip -O animal_data/synthetic_animal/hound_combineds5r5_texture.zip
unzip ./animal_data/synthetic_animal/horse_combineds5r5_texture.zip -d ./animal_data/synthetic_animal/
unzip ./animal_data/synthetic_animal/tiger_combineds5r5_texture.zip -d ./animal_data/synthetic_animal/
unzip ./animal_data/synthetic_animal/sheep_combineds5r5_texture.zip -d ./animal_data/synthetic_animal/
unzip ./animal_data/synthetic_animal/hound_combineds5r5_texture.zip -d ./animal_data/synthetic_animal/
rm -r ./animal_data/synthetic_animal/horse_combineds5r5_texture.zip
rm -r ./animal_data/synthetic_animal/tiger_combineds5r5_texture.zip
rm -r ./animal_data/synthetic_animal/sheep_combineds5r5_texture.zip
rm -r ./animal_data/synthetic_animal/hound_combineds5r5_texture.zip

