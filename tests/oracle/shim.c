/* Test-oracle shim: compiles the reference's processing modules (from
 * /root/reference, not copied into this repo) into a shared library the test
 * suite drives via ctypes, so deterministic paths can be checked bit-for-bit.
 *
 * The reference's LUT accessors live in main.c, which cannot build without
 * libfuse; this shim provides equivalents with the documented semantics
 * (main.c:128-196): truncated log2 fixed-point tables offset by black level.
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stddef.h>
#include <math.h>
#include "raw.h"
#include "mlv.h"
#include "mlvfs.h"
#include "dng.h"
#include "hdr.h"
#include "cs.h"
#include "stripes.h"
#include "patternnoise.h"
#include "histogram.h"

double * get_raw2evf(int black)
{
    static int done = 0;
    static double table[16384 + MAX_BLACK];
    if (!done)
    {
        memset(table, 0, MAX_BLACK * sizeof(int));   /* same partial clear as the reference */
        for (int i = 0; i < 16384; i++)
            table[i + MAX_BLACK] = log2(i) * EV_RESOLUTION;
        done = 1;
    }
    if (black > MAX_BLACK) return NULL;
    return &table[MAX_BLACK - black];
}

int * get_raw2ev(int black)
{
    static int done = 0;
    static int table[16384 + MAX_BLACK];
    if (!done)
    {
        memset(table, 0, MAX_BLACK * sizeof(int));
        for (int i = 0; i < 16384; i++)
            table[i + MAX_BLACK] = (int)(log2(i) * EV_RESOLUTION);
        done = 1;
    }
    if (black > MAX_BLACK) return NULL;
    return &table[MAX_BLACK - black];
}

int * get_ev2raw()
{
    static int done = 0;
    static int table[24 * EV_RESOLUTION];
    int * ev2raw = table + 10 * EV_RESOLUTION;
    if (!done)
    {
        for (int i = -10 * EV_RESOLUTION; i < 14 * EV_RESOLUTION; i++)
            ev2raw[i] = (int)(pow(2, (float)i / EV_RESOLUTION));
        done = 1;
    }
    return ev2raw;
}

/* ------- entry points with simple ABI for ctypes ------- */

size_t oracle_sizeof_frame_headers(void) { return sizeof(struct frame_headers); }

/* field offsets so Python can assemble the struct bytes safely */
void oracle_frame_headers_offsets(int * out)
{
    out[0] = (int)offsetof(struct frame_headers, fileNumber);
    out[1] = (int)offsetof(struct frame_headers, position);
    out[2] = (int)offsetof(struct frame_headers, vidf_hdr);
    out[3] = (int)offsetof(struct frame_headers, file_hdr);
    out[4] = (int)offsetof(struct frame_headers, rtci_hdr);
    out[5] = (int)offsetof(struct frame_headers, idnt_hdr);
    out[6] = (int)offsetof(struct frame_headers, rawi_hdr);
    out[7] = (int)offsetof(struct frame_headers, expo_hdr);
    out[8] = (int)offsetof(struct frame_headers, lens_hdr);
    out[9] = (int)offsetof(struct frame_headers, wbal_hdr);
}

size_t oracle_dng_header(void * fh, uint8_t * out, size_t max_size, double fps, char * basename)
{
    return dng_get_header_data((struct frame_headers *)fh, out, 0, max_size, fps, basename);
}

size_t oracle_unpack(void * fh, uint16_t * packed, uint8_t * out, size_t max_size)
{
    return dng_get_image_data((struct frame_headers *)fh, packed, out, 0, max_size);
}

void oracle_chroma_smooth(void * fh, uint16_t * data, int method)
{
    chroma_smooth((struct frame_headers *)fh, data, method);
}

void oracle_fix_focus_pixels(void * fh, uint16_t * data, int dual_iso)
{
    fix_focus_pixels((struct frame_headers *)fh, data, dual_iso);
}

void oracle_fix_bad_pixels(void * fh, uint16_t * data, int aggressive, int dual_iso)
{
    fix_bad_pixels((struct frame_headers *)fh, data, aggressive, dual_iso);
}

void oracle_fix_pattern_noise(int16_t * data, int w, int h, int white, int debug)
{
    fix_pattern_noise(data, w, h, white, debug);
}

/* stripes: compute on one frame, return 8 fixed-point gains + needed flag */
int oracle_stripes(void * fh, uint16_t * data, size_t n_pixels, int * gains_out, int apply)
{
    struct stripes_correction corr;
    memset(&corr, 0, sizeof(corr));
    srand(1); /* deterministic dither stream for parity runs */
    stripes_compute_correction((struct frame_headers *)fh, &corr, data, 0, n_pixels);
    for (int i = 0; i < 8; i++) gains_out[i] = corr.coeffficients[i];
    if (apply)
        stripes_apply_correction((struct frame_headers *)fh, &corr, data, 0, n_pixels);
    return corr.correction_needed;
}

int oracle_hdr_preview(void * fh, uint16_t * data, size_t max_size)
{
    return hdr_convert_data((struct frame_headers *)fh, data, 0, max_size);
}

int oracle_cr2hdr20(void * fh, uint16_t * data, int interp, int fullres, int alias_map,
                    int cs_method, int bad_pix)
{
    return cr2hdr20_convert_data((struct frame_headers *)fh, data, interp, fullres,
                                 alias_map, cs_method, bad_pix);
}

/* black/white levels after dual-iso conversion mutate the rawi header */
void oracle_get_levels(void * fh, int * black, int * white)
{
    struct frame_headers * f = (struct frame_headers *)fh;
    *black = f->rawi_hdr.raw_info.black_level;
    *white = f->rawi_hdr.raw_info.white_level;
}

void oracle_deflicker(void * fh, int target, uint16_t * data, size_t size, int32_t * bias_out)
{
    /* replicate deflicker (main.c:895-906) on top of the reference histogram */
    struct frame_headers * f = (struct frame_headers *)fh;
    uint16_t black = f->rawi_hdr.raw_info.black_level;
    uint16_t white = (1 << f->rawi_hdr.raw_info.bits_per_pixel) + 1;
    struct histogram * hist = hist_create(white);
    hist_add(hist, data + 1, (uint32_t)((size - 1) / 2), 1);
    uint16_t median = hist_median(hist);
    double correction = log2((double)(target - black) / (median - black));
    bias_out[0] = (int32_t)(correction * 10000);
    bias_out[1] = 10000;
    hist_destroy(hist);
}

/* ------- composed process_frame chain (main.c:908-1005) -------
 * Replicates the reference orchestrator on an in-memory frame, in the exact
 * order main.c runs it: deflicker -> header -> pattern noise -> dual-ISO
 * (with header redo) -> else focus/bad fixes -> chroma (skipped when
 * dual_iso==2 did it) -> stripes compute+apply. This is the end-to-end
 * oracle for flag-interaction fuzzing: every module is already individually
 * gated, this checks the composition the convert path actually runs.
 *
 * Notes mirroring main.c quirks:
 * - the dual-ISO header redo passes the IMAGE size as max_size
 *   (main.c:963 "image_buffer->size"), so for frames smaller than 64 KiB
 *   only the head of the header is refreshed; callers fuzzing dual-ISO
 *   must use geometries with 2*w*h >= 65536 (real sensor crops always are)
 * - fix_focus_pixels in the else-branch runs unconditionally with
 *   dual_iso=0 (main.c:968); map presence decides whether pixels change
 * - stripes gains are computed from this frame (the reference caches per
 *   MLV path from the first processed frame, main.c:980-996); srand(1)
 *   pins the dither stream like oracle_stripes so runs are reproducible
 * - caller must chdir to the .fpm map directory (cs.c:369 loads from CWD)
 */
int oracle_process_frame(void * fh, uint16_t * data, size_t size_bytes,
                         uint8_t * header, size_t header_size,
                         int deflicker_target, double fps, char * basename,
                         int fix_pattern_noise_f, int dual_iso, int hdr_interp,
                         int hdr_fullres, int hdr_alias_map,
                         int chroma_smooth_f, int fix_bad_pixels_f,
                         int fix_stripes_f, int * stripes_gains_out,
                         int * stripes_needed_out)
{
    struct frame_headers * f = (struct frame_headers *)fh;
    if (deflicker_target)
    {   /* deflicker (main.c:895-906): mutates exposure_bias pre-header */
        uint16_t black = f->rawi_hdr.raw_info.black_level;
        uint16_t white = (1 << f->rawi_hdr.raw_info.bits_per_pixel) + 1;
        struct histogram * hist = hist_create(white);
        hist_add(hist, data + 1, (uint32_t)((size_bytes - 1) / 2), 1);
        uint16_t median = hist_median(hist);
        double correction = log2((double)(deflicker_target - black) / (median - black));
        f->rawi_hdr.raw_info.exposure_bias[0] = (int32_t)(correction * 10000);
        f->rawi_hdr.raw_info.exposure_bias[1] = 10000;
        hist_destroy(hist);
    }
    dng_get_header_data(f, header, 0, header_size, fps, basename);
    if (fix_pattern_noise_f)
        fix_pattern_noise((int16_t *)data, f->rawi_hdr.xRes, f->rawi_hdr.yRes,
                          f->rawi_hdr.raw_info.white_level, 0);
    int is_dual_iso = 0;
    if (dual_iso == 1)
        is_dual_iso = hdr_convert_data(f, data, 0, size_bytes);
    else if (dual_iso == 2)
        is_dual_iso = cr2hdr20_convert_data(f, data, hdr_interp, hdr_fullres,
                                            hdr_alias_map, chroma_smooth_f,
                                            fix_bad_pixels_f);
    if (is_dual_iso)
    {   /* header redo at image size, preserving the main.c:963 quirk */
        dng_get_header_data(f, header, 0, size_bytes, fps, basename);
    }
    else
    {
        fix_focus_pixels(f, data, 0);
        if (fix_bad_pixels_f)
            fix_bad_pixels(f, data, fix_bad_pixels_f == 2, is_dual_iso);
    }
    if (chroma_smooth_f && dual_iso != 2)
        chroma_smooth(f, data, chroma_smooth_f);
    if (fix_stripes_f)
    {
        struct stripes_correction corr;
        memset(&corr, 0, sizeof(corr));
        srand(1);
        stripes_compute_correction(f, &corr, data, 0, size_bytes / 2);
        stripes_apply_correction(f, &corr, data, 0, size_bytes / 2);
        for (int i = 0; i < 8; i++) stripes_gains_out[i] = corr.coeffficients[i];
        *stripes_needed_out = corr.correction_needed;
    }
    return is_dual_iso;
}

/* direct access to the AMaZE demosaic for core parity tests */
void amaze_demosaic_RT(float** rawData, float** red, float** green, float** blue,
                       int winx, int winy, int winw, int winh);

void oracle_amaze(float * raw_flat, float * r_flat, float * g_flat, float * b_flat,
                  int w, int h, int stride)
{
    float ** rows_raw = malloc(h * sizeof(float*));
    float ** rows_r = malloc(h * sizeof(float*));
    float ** rows_g = malloc(h * sizeof(float*));
    float ** rows_b = malloc(h * sizeof(float*));
    for (int i = 0; i < h; i++)
    {
        rows_raw[i] = raw_flat + (size_t)i * stride;
        rows_r[i] = r_flat + (size_t)i * stride;
        rows_g[i] = g_flat + (size_t)i * stride;
        rows_b[i] = b_flat + (size_t)i * stride;
    }
    amaze_demosaic_RT(rows_raw, rows_r, rows_g, rows_b, 0, 0, w, h);
    free(rows_raw); free(rows_r); free(rows_g); free(rows_b);
}

/* ------- WAV / GIF whole-file oracles -------
 * wav.c and gif.c compile as-is (they only need index.c), but gif.c calls
 * two functions that live in main.c, which cannot build without libfuse:
 * mlv_get_frame_headers (the xref walk, main.c:429-558) and get_image_data
 * (decode dispatch, main.c:569-706; packed-uncompressed case only is
 * needed by parity clips). Shim equivalents with the same semantics: */

#include "index.h"
#include "wav.h"
#include "gif.h"

FILE **mlvfs_load_chunks(const char * path, uint32_t * count)
{
    return load_chunks(path, count);
}

void mlvfs_close_chunks(FILE ** files, uint32_t count)
{
    close_chunks(files, count);
}

int mlv_get_frame_headers(const char *mlv_filename, int index, struct frame_headers * frame_headers)
{
    uint32_t chunk_count = 0;
    FILE **chunk_files = load_chunks(mlv_filename, &chunk_count);
    if(!chunk_files || !chunk_count) return 0;
    memset(frame_headers, 0, sizeof(struct frame_headers));
    mlv_xref_hdr_t *block_xref = get_index(mlv_filename);
    if (!block_xref) { close_chunks(chunk_files, chunk_count); return 0; }
    mlv_xref_t *xrefs = (mlv_xref_t *)&(((uint8_t*)block_xref)[sizeof(mlv_xref_hdr_t)]);
    int found = 0, rawi_found = 0;
    uint32_t vidf_counter = 0;
    mlv_hdr_t mlv_hdr;
    uint32_t hdr_size;
    for(uint32_t i = 0; (i < block_xref->entryCount) && !found; i++)
    {
        FILE *in_file = chunk_files[xrefs[i].fileNumber];
        int64_t position = xrefs[i].frameOffset;
        if (xrefs[i].frameType == MLV_FRAME_VIDF)
        {
            if ((uint32_t)index == vidf_counter)
            {
                found = 1;
                frame_headers->fileNumber = xrefs[i].fileNumber;
                frame_headers->position = position;
                file_set_pos(in_file, position, SEEK_SET);
                fread(&mlv_hdr, sizeof(mlv_hdr_t), 1, in_file);
                file_set_pos(in_file, position, SEEK_SET);
                hdr_size = sizeof(mlv_vidf_hdr_t) < mlv_hdr.blockSize ? sizeof(mlv_vidf_hdr_t) : mlv_hdr.blockSize;
                fread(&frame_headers->vidf_hdr, hdr_size, 1, in_file);
            }
            else vidf_counter++;
        }
        else if (xrefs[i].frameType == MLV_FRAME_UNSPECIFIED)
        {
            file_set_pos(in_file, position, SEEK_SET);
            if(fread(&mlv_hdr, sizeof(mlv_hdr_t), 1, in_file))
            {
                file_set_pos(in_file, position, SEEK_SET);
#define GRAB(tag, field, type) \
                if(!memcmp(mlv_hdr.blockType, tag, 4)) { \
                    hdr_size = sizeof(type) < mlv_hdr.blockSize ? sizeof(type) : mlv_hdr.blockSize; \
                    fread(&frame_headers->field, hdr_size, 1, in_file); \
                    if (!memcmp(tag, "RAWI", 4)) rawi_found = 1; \
                }
                GRAB("MLVI", file_hdr, mlv_file_hdr_t)
                else GRAB("RTCI", rtci_hdr, mlv_rtci_hdr_t)
                else GRAB("IDNT", idnt_hdr, mlv_idnt_hdr_t)
                else GRAB("RAWI", rawi_hdr, mlv_rawi_hdr_t)
                else GRAB("EXPO", expo_hdr, mlv_expo_hdr_t)
                else GRAB("LENS", lens_hdr, mlv_lens_hdr_t)
                else GRAB("WBAL", wbal_hdr, mlv_wbal_hdr_t)
#undef GRAB
            }
        }
    }
    free(block_xref);
    close_chunks(chunk_files, chunk_count);
    return found && rawi_found;
}

size_t get_image_data(struct frame_headers * frame_headers, FILE * file, uint8_t * output_buffer, off_t offset, size_t max_size)
{
    /* packed-uncompressed path only (main.c:686-704) — parity clips for the
     * GIF oracle are uncompressed */
    int bpp = frame_headers->rawi_hdr.raw_info.bits_per_pixel;
    uint64_t pixel_start_index = (offset > 0 ? offset : 0) / 2;
    uint64_t pixel_start_address = pixel_start_index * bpp / 16;
    size_t output_size = max_size - (offset < 0 ? (size_t)(-offset) : 0);
    uint64_t pixel_count = output_size / 2;
    uint64_t packed_size = (pixel_count + 2) * bpp / 16;
    uint16_t * packed_bits = calloc((size_t)(packed_size * 2), 1);
    size_t result = 0;
    if(packed_bits)
    {
        file_set_pos(file, frame_headers->position + frame_headers->vidf_hdr.frameSpace + sizeof(mlv_vidf_hdr_t) + pixel_start_address * 2, SEEK_SET);
        fread(packed_bits, sizeof(uint16_t), (size_t)packed_size, file);
        result = dng_get_image_data(frame_headers, packed_bits, output_buffer, offset, max_size);
        free(packed_bits);
    }
    return result;
}

int oracle_has_audio(const char * path) { return has_audio(path); }

long oracle_wav_size(const char * path) { return (long)wav_get_size(path); }

long oracle_wav(const char * path, uint8_t * out, size_t max_size, unsigned seed)
{
    srand(seed); /* wav.c:253 stamps originator_reference from rand() */
    return (long)wav_get_data(path, out, 0, max_size);
}

long oracle_gif_size(void * fh)
{
    return (long)gif_get_size((struct frame_headers *)fh);
}

long oracle_gif(const char * path, uint8_t * out, size_t max_size)
{
    return (long)gif_get_data(path, out, 0, max_size);
}

/* reference LJ92 decoder, for interop tests of our encoder/decoder */
#include "lj92.h"
int oracle_lj92_decode(uint8_t * data, int datalen, uint16_t * out, int out_pixels,
                       int * dims)
{
    lj92 handle;
    int w = 0, h = 0, bits = 0;
    int ret = lj92_open(&handle, data, datalen, &w, &h, &bits);
    if (ret != LJ92_ERROR_NONE) return ret;
    dims[0] = w; dims[1] = h; dims[2] = bits;
    if (w * h > out_pixels) { lj92_close(handle); return -100; }
    ret = lj92_decode(handle, out, w * h, 0, NULL, 0);
    lj92_close(handle);
    return ret;
}

int oracle_lj92_encode(uint16_t * img, int width, int height, int bitdepth,
                       uint8_t * out, int out_cap)
{
    uint8_t * encoded = NULL;
    int enclen = 0;
    int ret = lj92_encode(img, width, height, bitdepth, width * height, 0, NULL, 0,
                          &encoded, &enclen);
    if (ret != LJ92_ERROR_NONE) return -1;
    if (enclen > out_cap) { free(encoded); return -2; }
    memcpy(out, encoded, enclen);
    free(encoded);
    return enclen;
}
