/* Headless driver + stubs for the reference DSP core.
 *
 * This file is ORIGINAL glue code for the linrad_tpu test suite.  It is
 * compiled together with translation units read from the mounted
 * reference tree (/root/reference) at test time; no reference code is
 * copied into this repository.  The stubs replace the reference's
 * platform layer (X11 screen, keyboard, events, threads) so the DSP
 * chain can run single-threaded inside a shared library, reproducing
 * the no_of_processors==1 protocol of wcw.c:974-1118 (wideband) and
 * the do_fft3/do_mix2 thread loops (fft3.c:35, mix2.c:41).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <time.h>
#include <sys/time.h>
#include <signal.h>
#include <execinfo.h>

#include "osnum.h"
#include "globdef.h"
#include "uidef.h"
#include "thrdef.h"
#include "screendef.h"
#include "fft1def.h"
#include "fft2def.h"
#include "fft3def.h"
#include "seldef.h"
#include "blnkdef.h"
#include "sigdef.h"
#include "caldef.h"
#include "llsqdef.h"
#include "txdef.h"
#include "keyboard_def.h"
#include "sdrdef.h"

/* ------------------------------------------------------------------ */
/* Platform stubs: single-threaded, no screen, no keyboard.           */
/* ------------------------------------------------------------------ */

int refapi_errcode = 0;          /* last lirerr() code, 0 = none */

/* print a native backtrace on SIGSEGV so crashes in the reference DSP
 * code are locatable without gdb (addresses resolvable via addr2line) */
static void segv_handler(int sig)
{
  void *frames[32];
  int n = backtrace(frames, 32);
  fprintf(stderr, "refharness: signal %d, backtrace:\n", sig);
  backtrace_symbols_fd(frames, n, 2);
  signal(sig, SIG_DFL);
  raise(sig);
}

__attribute__((constructor)) static void install_segv(void)
{
  signal(SIGSEGV, segv_handler);
  signal(SIGBUS, segv_handler);
}

void lirerr(int errcod)
{
  refapi_errcode = errcod;
  kill_all_flag = 1;
}

double current_time(void)
{
  struct timeval t;
  gettimeofday(&t, NULL);
  recent_time = 0.000001 * t.tv_usec + t.tv_sec;
  return recent_time;
}

/* same semantics as the reference utility (ui.c): round up to the next
 * power of two, return the exponent */
int make_power_of_two(int *i)
{
  int k = -1;
  i[0] += i[0] - 1;
  while (i[0] != 0) { i[0] /= 2; k++; }
  i[0] = 1 << k;
  return k;
}

void *chk_free(void *p) { free(p); return NULL; }

void lir_sched_yield(void) {}
void lir_sleep(int us) { (void)us; }
void lir_sync(void) {}
int lir_get_epoch_seconds(void) { return (int)time(NULL); }

/* events/mutexes: everything runs inline on one thread */
void lir_init_event(int no) { (void)no; }
void lir_close_event(int no) { (void)no; }
void lir_set_event(int no) { (void)no; }
void lir_await_event(int no) { (void)no; }
void lir_mutex_lock(int no) { (void)no; }
void lir_mutex_unlock(int no) { (void)no; }
void lir_mutex_init(void) {}
void lir_mutex_destroy(void) {}
void linrad_thread_create(int no) { (void)no; }
void linrad_thread_stop_and_join(int no) { (void)no; }
void pause_thread(int no) { (void)no; }
void resume_thread(int no) { (void)no; }
void clear_thread_times(int no) { (void)no; }
void fix_thread_affinities(void) {}

/* screen / mouse / keyboard primitives */
void lir_text(int x, int y, char *s) { (void)x; (void)y; (void)s; }
void lir_pixwrite(int x, int y, char *s) { (void)x; (void)y; (void)s; }

/* The screen primitives below are FUNCTION POINTERS in the reference
 * (lscreen.h: selected among X11/fbdev/svgalib at startup); stub them
 * as pointers to local no-ops. */
static void nop_void(void) {}
static void nop_5i(int a,int b,int c,int d,unsigned char e)
                                 { (void)a;(void)b;(void)c;(void)d;(void)e; }
static void nop_hline(int a,int b,int c,unsigned char d)
                                 { (void)a;(void)b;(void)c;(void)d; }
static void nop_box(int a,int b,int c,int d,size_t *e)
                                 { (void)a;(void)b;(void)c;(void)d;(void)e; }
static void nop_setpixel(int a,int b,unsigned char c)
                                 { (void)a;(void)b;(void)c; }
static int nop_getpixel(int a,int b) { (void)a;(void)b; return 0; }
static void nop_fixbug(int a) { (void)a; }
static void nop_palette(int j,int *r,int *g,int *b)
                                 { (void)j; *r = *g = *b = 0; }
void (*clear_screen)(void) = nop_void;
void (*lir_refresh_screen)(void) = nop_void;
void (*lir_refresh_entire_screen)(void) = nop_void;
void (*lir_line)(int,int,int,int,unsigned char) = nop_5i;
void (*lir_hline)(int,int,int,unsigned char) = nop_hline;
void (*lir_putbox)(int,int,int,int,size_t*) = nop_box;
void (*lir_getbox)(int,int,int,int,size_t*) = nop_box;
void (*lir_fillbox)(int,int,int,int,unsigned char) = nop_5i;
void (*lir_fix_bug)(int) = nop_fixbug;
void (*lir_getpalettecolor)(int,int*,int*,int*) = nop_palette;
void (*lir_setpixel)(int,int,unsigned char) = nop_setpixel;
int (*lir_getpixel)(int,int) = nop_getpixel;
void clear_lines(int a, int b) { (void)a; (void)b; }
void hide_mouse(int a,int b,int c,int d) { (void)a;(void)b;(void)c;(void)d; }
void unconditional_hide_mouse(void) {}
void pause_screen_and_hide_mouse(void) {}
void mouse_nothing(void) {}
void settextcolor(unsigned char c) { (void)c; }
void graph_borders(WG_PARMS *a, unsigned char c) { (void)a; (void)c; }
void set_graph_minwidth(WG_PARMS *a) { (void)a; }
void check_graph_placement(WG_PARMS *a) { (void)a; }
void make_button(int x,int y,BUTTONS *b,int m,char c)
                                 { (void)x;(void)y;(void)b;(void)m;(void)c; }
void clear_button(BUTTONS *b, int m)
{  /* same semantics as the reference ui utility: mark slots unused */
  int i;
  for (i = 0; i < m; i++) { b[i].x1 = -1; b[i].x2 = -1;
                            b[i].y1 = -1; b[i].y2 = -1; }
}
void help_message(int no) { (void)no; }
void xz(char *s) { (void)s; }
void lir_set_title(char *s) { (void)s; }

/* keyboard interaction: never expected headless — report + error out */
void await_keyboard(void) { lirerr(900001); }
void await_processed_keyboard(void) { lirerr(900002); }
void to_upper_await_keyboard(void) { lirerr(900003); }
void clear_await_keyboard(void) {}
int lir_get_integer(int x,int y,int n,int lo,int hi)
                { (void)x;(void)y;(void)n;(void)hi; lirerr(900004);
                  return lo; }
double lir_get_float(int x,int y,int n,double lo,double hi)
                { (void)x;(void)y;(void)n;(void)hi; lirerr(900005);
                  return lo; }
int lir_get_filename(int x,int y,char *s) { (void)x;(void)y;(void)s;
                  lirerr(900006); return 0; }

/* ASM / SIMD kernels: the harness always selects the plain C float
 * path (FIRST_FFT_VERNR -> "Radix 4 DIT C", FIRST_BCKFFT_VERNR=0 ->
 * "Twin Radix 4 DIT C", SECOND_FFT_VERNR=0 -> "Radix 2 DIF C",
 * fft1var.c:43-89); reaching one of these is a configuration bug. */
static void asm_trap(void) { lirerr(900100); }
void simdbulk_of_dual_dit(int a,int b,float *c,COSIN_TABLE *d)
                          { (void)a;(void)b;(void)c;(void)d; asm_trap(); }
void mmx_fft1back_one(void) { asm_trap(); }
void mmx_fft1back_two(void) { asm_trap(); }
void fft1back_mmx_finish(void) { asm_trap(); }
void fft2mmx_a1_win(void) { asm_trap(); }
void fft2mmx_a1_nowin(void) { asm_trap(); }
void fft2mmx_a2_win(void) { asm_trap(); }
void fft2mmx_a2_nowin(void) { asm_trap(); }
void fft2_mmx_b1hi(void) { asm_trap(); }
void fft2_mmx_b1med(void) { asm_trap(); }
void fft2_mmx_b1low(void) { asm_trap(); }
void fft2_mmx_b2hi(void) { asm_trap(); }
void fft2_mmx_b2med(void) { asm_trap(); }
void fft2_mmx_b2low(void) { asm_trap(); }
void fft2_mmx_c1(void) { asm_trap(); }
void fft2_mmx_c2(void) { asm_trap(); }

/* hardware / drivers / network / tx: absent headless */
void wse_parport_ack(void) {}
void wse_parport_ack_sign(void) {}
void wse_parport_status(void) {}
void wse_parport_control(void) {}
int read_wse_parameters(void) { return 0; }
int lir_parport_permission(int a) { (void)a; return -1; }
void net_send_slaves_freq(void) {}
void users_init_mode(void) {}
void users_extra_fast(void) {}

/* ------------------------------------------------------------------ */
/* Setup + drive                                                       */
/* ------------------------------------------------------------------ */

/* defined in uivar.c:369 */
extern int genparm_default[MAX_RX_MODE][MAX_GENPARM];

/* wcw.c / fft1.c entry points not declared in headers */
void do_fft1_c(void);

int refapi_setup_done = 0;

/* liminfo bookkeeping (wcw.c:525-529 locals of the wideband thread) */
static int local_fft1_liminfo_cnt = 0;
static int local_fft2_liminfo_cnt = 0;
static int liminfo_auto = 1;
/* pretend amplitude calibration is present, so init_blanker builds the
 * reference-pulse bank from the default fft1_desired and the clever
 * blanker stays enabled (init_hires_graph forces it off uncalibrated);
 * set BEFORE ref_setup. */
static int pretend_calamp = 0;
static int setup_cw_decode = 0;
void ref_enable_cw_decode(int on) { setup_cw_decode = on; }
static int setup_max_spurs = 0;
void ref_enable_spurs(int n) { setup_max_spurs = n; }
void ref_set_pretend_calamp(int on) { pretend_calamp = on; }

void ref_teardown(void)
{
  if (refapi_setup_done) {
    free_buffers();
    refapi_setup_done = 0;
  }
}

/* Configure ui + genparm like init_genparm (menu.c:1925/2113) would for
 * the given mode, then run the normal_rx_routine bring-up sequence
 * (menu.c:576-700) minus threads/devices. */
int ref_setup(int mode, int ad_speed, int input_mode, int rf_channels,
              int second_fft, int fft1_bw_centihz, int fft1_vernr,
              int sinpow, int afc_enable)
{
  int i;
  ref_teardown();
  refapi_errcode = 0;
  kill_all_flag = 0;
  lir_status = LIR_OK;
  rx_mode = mode;
  /* the menu dispatch sets use_bfo per mode before normal_rx_routine
   * (menu.c:3149-3161): 1 for CW/SSB modes, 0 for AM/FM */
  use_bfo = (mode == MODE_AM || mode == MODE_FM) ? 0 : 1;
  no_of_processors = 1;
  /* identity channel-2 amplitude/phase adjustment: the pol graph sets
   * these from pg.ch2_gain/ch2_phase (pol_graph.c:160-170); headless
   * they stay 0.0 and fft1_b's final block (fft1.c:4064-4080) would
   * multiply the second RF channel by zero. */
  pg_ch2_c1 = 1.0F;
  pg_ch2_c2 = 0.0F;
  /* wide enough that the wide graph spans every fft1 bin: fft1_c only
   * calibrates [fft1_first_point, fft1_last_point] = the displayed
   * range (fft1.c:4615-4627), so a narrow virtual screen would leave
   * band edges uncalibrated. */
  screen_width = 34000;
  screen_height = 768;
  /* normally set by init_font (fonts.c:10203), which is not compiled
   * headless; init_hires_graph's placement check loops forever on 0 */
  screen_last_xpixel = screen_width - 1;
  text_width = 8;
  text_height = 16;
  no_of_scro = 0;
  diskread_flag = 2;      /* file input: paces nothing, headless */

  memset(&ui, 0, sizeof(ui));
  ui.rx_input_mode = input_mode;
  ui.rx_rf_channels = rf_channels;
  ui.rx_ad_channels = (input_mode & IQ_DATA) ? 2 * rf_channels
                                             : rf_channels;
  ui.rx_ad_speed = ad_speed;
  ui.max_dma_rate = 300;
  ui.min_dma_rate = 30;
  ui.rx_min_da_channels = 1;
  ui.rx_min_da_bytes = 1;
  ui.rx_max_da_channels = 2;
  ui.rx_max_da_bytes = 2;
  ui.rx_min_da_speed = 5000;
  ui.rx_max_da_speed = 96000;
  ui.operator_skil = 3; /* expert: no newcomer param masking */
  ui.max_blocked_cpus = 0;
  ui.rx_addev_no = 255;

  for (i = 0; i < MAX_GENPARM; i++) genparm[i] = genparm_default[mode][i];
  genparm[SECOND_FFT_ENABLE] = second_fft;
  if (fft1_bw_centihz > 0) genparm[FIRST_FFT_BANDWIDTH] = fft1_bw_centihz;
  if (fft1_vernr >= 0) genparm[FIRST_FFT_VERNR] = fft1_vernr;
  if (sinpow >= 0) genparm[FIRST_FFT_SINPOW] = sinpow;
  genparm[FIRST_FFT_NO_OF_THREADS] = 1;  /* clamps to 0 workers */
  genparm[FIRST_BCKFFT_VERNR] = 0;       /* Twin Radix 4 DIT C (swfloat) */
  genparm[SECOND_FFT_VERNR] = 0;         /* Radix 2 DIF C */
  genparm[AFC_ENABLE] = afc_enable;
  if (!afc_enable) genparm[AFC_LOCK_RANGE] = 0;
  genparm[MAX_NO_OF_SPURS] = setup_max_spurs;
  genparm[CW_DECODE_ENABLE] = setup_cw_decode;
  if (setup_cw_decode && dmp == NULL) dmp = fopen("/dev/null", "w");
  genparm[FFT1_CORRELATION_SPECTRUM] = 0;

  fft1_correlation_flag = 0;

  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] sizes\n");
  get_wideband_sizes();
  if (kill_all_flag) return -refapi_errcode;
  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] buffers\n");
  get_buffers(1);
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;
  refapi_setup_done = 1;
  check_filtercorr_direction();
  if (pretend_calamp) fft1_calibrate_flag |= CALAMP;
  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] wide_graph\n");
  init_wide_graph();
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;
  /* zoom the wide graph out to the full spectrum: the default shows
   * ~half (wide_graph.c wg_default_x) and fft1_c/liminfo only process
   * the displayed range (fft1.c:4607-4630). */
  wg.xleft = 0;
  wg.xright = fft1_size + 6 * text_width - 1;
  wg.first_xpoint = 0;
  wg.xpoints = fft1_size;
  wg.pixels_per_xpoint = 1;
  wg.xpoints_per_pixel = 1;
  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] make_wide\n");
  make_wide_graph(0);
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;
  if (genparm[SECOND_FFT_ENABLE] != 0) {
    if(getenv("REF_TRACE"))fprintf(stderr,"[ref] blanker\n");
    init_blanker();
    if (kill_all_flag || lir_status != LIR_OK)
      return refapi_errcode ? -refapi_errcode : lir_status;
    if(getenv("REF_TRACE"))fprintf(stderr,"[ref] hires\n");
    init_hires_graph();
    if (kill_all_flag || lir_status != LIR_OK)
      return refapi_errcode ? -refapi_errcode : lir_status;
  }
  if (genparm[AFC_ENABLE] != 0 && genparm[AFC_LOCK_RANGE] != 0) {
    init_afc_graph();
    if (kill_all_flag || lir_status != LIR_OK)
      return refapi_errcode ? -refapi_errcode : lir_status;
  }
  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] baseband\n");
  init_baseband_graph();
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;
  if(getenv("REF_TRACE"))fprintf(stderr,"[ref] coherent\n");
  init_coherent_graph();
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;

  for (i = 0; i < THREAD_MAX; i++) {
    thread_command_flag[i] = THRFLAG_ACTIVE;
    thread_status_flag[i] = THRFLAG_ACTIVE;
  }
  local_fft1_liminfo_cnt = fft1_liminfo_cnt;
  local_fft2_liminfo_cnt = fft2_liminfo_cnt;
  liminfo_auto = 1;
  /* keep the S-meter section of fft3_mix2 disabled (its gate is
   * mg.avgnum > 0, mix2.c:1358): headless there is no meter graph, and
   * with one RF channel the meter writer indexes mg_rms_meter[2*mg_pa+1]
   * past its rx_rf_channels-sized allocation (mix2.c:1478 vs
   * buf.c:1201) — an upstream quirk we must not trip. */
  mg.avgnum = 0;
  return 0;
}

int ref_set_genparm(int idx, int val)
{
  if (idx < 0 || idx >= MAX_GENPARM) return -1;
  genparm[idx] = val;
  return 0;
}

/* set a named hires-graph (blanker/sellim) parameter (screendef.h) */
int ref_set_hg(const char *name, double val)
{
  if (!strcmp(name, "clever_bln_mode")) { hg.clever_bln_mode = val; return 0; }
  if (!strcmp(name, "clever_bln_limit")) { hg.clever_bln_limit = val; return 0; }
  if (!strcmp(name, "clever_bln_factor")) { hg.clever_bln_factor = val; return 0; }
  if (!strcmp(name, "stupid_bln_mode")) { hg.stupid_bln_mode = val; return 0; }
  if (!strcmp(name, "stupid_bln_limit")) { hg.stupid_bln_limit = val; return 0; }
  if (!strcmp(name, "stupid_bln_factor")) { hg.stupid_bln_factor = val; return 0; }
  if (!strcmp(name, "blanker_ston_fft1")) { hg.blanker_ston_fft1 = val; return 0; }
  if (!strcmp(name, "blanker_ston_fft2")) { hg.blanker_ston_fft2 = val; return 0; }
  if (!strcmp(name, "sellim_par1")) { hg.sellim_par1 = val; return 0; }
  if (!strcmp(name, "sellim_par2")) { hg.sellim_par2 = val; return 0; }
  if (!strcmp(name, "sellim_par3")) { hg.sellim_par3 = val; return 0; }
  if (!strcmp(name, "sellim_par4")) { hg.sellim_par4 = val; return 0; }
  if (!strcmp(name, "sellim_par7")) { hg.sellim_par7 = val; return 0; }
  if (!strcmp(name, "sellim_par8")) { hg.sellim_par8 = val; return 0; }
  return -1;
}

double ref_get_hg(const char *name)
{
  if (!strcmp(name, "clever_bln_limit")) return hg.clever_bln_limit;
  if (!strcmp(name, "stupid_bln_limit")) return hg.stupid_bln_limit;
  if (!strcmp(name, "clever_bln_mode")) return hg.clever_bln_mode;
  if (!strcmp(name, "stupid_bln_mode")) return hg.stupid_bln_mode;
  return -999999.0;
}

/* set a named wide-graph parameter */
int ref_set_wg(const char *name, double val)
{
  if (!strcmp(name, "fft_avg1num")) { wg.fft_avg1num = val; return 0; }
  if (!strcmp(name, "spek_avgnum")) { wg.spek_avgnum = val; return 0; }
  return -1;
}

/* set a named baseband-graph parameter (filter/demod config) */
extern int new_bg_coherent;   /* file-scope request, baseb_graph.c:75 */

int ref_set_bg(const char *name, double val)
{
  if (!strcmp(name, "bandwidth")) { bg.bandwidth = val; return 0; }
  if (!strcmp(name, "filter_flat")) { bg.filter_flat = val; return 0; }
  if (!strcmp(name, "filter_curv")) { bg.filter_curv = val; return 0; }
  if (!strcmp(name, "filter_shift")) { bg.filter_shift = val; return 0; }
  if (!strcmp(name, "first_frequency")) { bg.first_frequency = val;
                                          return 0; }
  if (!strcmp(name, "bfo_freq")) { bg.bfo_freq = val; return 0; }
  if (!strcmp(name, "agc_flag")) { bg.agc_flag = val; return 0; }
  if (!strcmp(name, "agc_attack")) { bg.agc_attack = val; return 0; }
  if (!strcmp(name, "agc_release")) { bg.agc_release = val; return 0; }
  if (!strcmp(name, "agc_hang")) { bg.agc_hang = val; return 0; }
  if (!strcmp(name, "coherent")) { bg_coherent = val; return 0; }
  /* the ACTIVE coherent mode is derived inside init_baseband_sizes
   * (baseb_graph.c:3086-3152: channel count + buffer layout follow);
   * set the REQUEST here, then retune so the derivation runs */
  if (!strcmp(name, "new_coherent")) { new_bg_coherent = val; return 0; }
  if (!strcmp(name, "fm_mode")) { bg.fm_mode = val; return 0; }
  if (!strcmp(name, "mixer_mode")) { bg.mixer_mode = val; return 0; }
  if (!strcmp(name, "coh_factor")) { bg.coh_factor = val; return 0; }
  if (!strcmp(name, "output_gain")) { bg.output_gain = val; return 0; }
  return -1;
}

/* ---- named access to geometry/scalars ---------------------------- */

#define GEO_INT(nm) if (!strcmp(name, #nm)) return (long)(nm)
long ref_geo(const char *name)
{
  GEO_INT(fft1_size); GEO_INT(fft1_n); GEO_INT(fft1_block);
  GEO_INT(fft1_interleave_points); GEO_INT(fft1_new_points);
  GEO_INT(fft2_size); GEO_INT(fft2_n);
  GEO_INT(fft2_interleave_points); GEO_INT(fft2_new_points);
  GEO_INT(fft3_size); GEO_INT(fft3_n);
  GEO_INT(timf1_bytes); GEO_INT(timf1_blockbytes);
  GEO_INT(timf2_size); GEO_INT(timf2_mask); GEO_INT(timf2pow_size);
  GEO_INT(timf2_input_block); GEO_INT(timf2_output_block);
  GEO_INT(timf3_block); GEO_INT(timf3_size); GEO_INT(timf3_mask);
  GEO_INT(max_fft1n); GEO_INT(max_fft2n);
  GEO_INT(refpul_size); GEO_INT(blanker_pulsewidth);
  GEO_INT(fft1_sumsq_bufsize);
  GEO_INT(fft1_first_point); GEO_INT(fft1_last_point);
  GEO_INT(fft1_first_inband); GEO_INT(fft1_last_inband);
  GEO_INT(liminfo_group_points); GEO_INT(liminfo_groups);
  GEO_INT(swfloat);
  GEO_INT(baseband_size);
  GEO_INT(fft1_na); GEO_INT(fft1_nb); GEO_INT(fft1_nc); GEO_INT(fft1_pa);
  GEO_INT(fft2_na); GEO_INT(fft2_nc); GEO_INT(fft2_pa);
  GEO_INT(fft1_sumsq_pa);
  GEO_INT(timf2_pa); GEO_INT(timf2_px); GEO_INT(timf2_pn2);
  GEO_INT(timf3_pa); GEO_INT(timf3_px);
  GEO_INT(fft3_pa); GEO_INT(fft3_px); GEO_INT(fft3_block);
  GEO_INT(baseb_pa); GEO_INT(baseb_px); GEO_INT(baseb_py);
  GEO_INT(daout_pa);
  GEO_INT(timf2_fitted_pulses); GEO_INT(timf2_cleared_points);
  GEO_INT(rx_daout_channels);
  if (!strcmp(name, "mix1_size")) return mix1.size;
  if (!strcmp(name, "mix1_n")) return mix1.n;
  if (!strcmp(name, "mix1_interleave_points")) return mix1.interleave_points;
  if (!strcmp(name, "mix1_crossover_points")) return mix1.crossover_points;
  if (!strcmp(name, "mix1_new_points")) return mix1.new_points;
  if (!strcmp(name, "mix2_size")) return mix2.size;
  if (!strcmp(name, "mix2_new_points")) return mix2.new_points;
  if (!strcmp(name, "errcode")) return refapi_errcode;
  if (!strcmp(name, "lir_status")) return lir_status;
  return -999999;
}

double ref_geof(const char *name)
{
  if (!strcmp(name, "fft1_bandwidth")) return fft1_bandwidth;
  if (!strcmp(name, "fft2_bandwidth")) return fft2_bandwidth;
  if (!strcmp(name, "fft1_blocktime")) return fft1_blocktime;
  if (!strcmp(name, "timf1_sampling_speed")) return timf1_sampling_speed;
  if (!strcmp(name, "timf3_sampling_speed")) return timf3_sampling_speed;
  if (!strcmp(name, "baseband_sampling_speed"))
    return baseband_sampling_speed;
  if (!strcmp(name, "timf2_noise_floor")) return timf2_noise_floor;
  if (!strcmp(name, "fft1_interleave_ratio")) return fft1_interleave_ratio;
  if (!strcmp(name, "mix1_lowest_fq")) return mix1_lowest_fq;
  if (!strcmp(name, "mix1_highest_fq")) return mix1_highest_fq;
  if (!strcmp(name, "clever_blanker_rate")) return clever_blanker_rate;
  if (!strcmp(name, "stupid_blanker_rate")) return stupid_blanker_rate;
  if (!strcmp(name, "fft1_noise_floor")) return fft1_noise_floor;
  if (!strcmp(name, "mix1_selfreq0")) return mix1_selfreq[0];
  return -999999.0;
}

/* ---- named access to arrays --------------------------------------- */

void *ref_array(const char *name)
{
  if (!strcmp(name, "fft1_float")) return fft1_float;
  if (!strcmp(name, "fft2_float")) return fft2_float;
  if (!strcmp(name, "timf2_float")) return timf2_float;
  if (!strcmp(name, "timf2_pwr_float")) return timf2_pwr_float;
  if (!strcmp(name, "timf3_float")) return timf3_float;
  if (!strcmp(name, "fft3_float")) return fft3;
  if (!strcmp(name, "baseb_raw")) return baseb_raw;
  if (!strcmp(name, "baseb")) return baseb;
  if (!strcmp(name, "baseb_out")) return baseb_out;
  if (!strcmp(name, "baseb_carrier")) return baseb_carrier;
  if (!strcmp(name, "liminfo")) return liminfo;
  if (!strcmp(name, "liminfo_wait")) return liminfo_wait;
  if (!strcmp(name, "fft1_sumsq")) return fft1_sumsq;
  if (!strcmp(name, "fft1_slowsum")) return fft1_slowsum;
  if (!strcmp(name, "fft1_window")) return fft1_window;
  if (!strcmp(name, "fft2_window")) return fft2_window;
  if (!strcmp(name, "wg_waterf_yfac")) return wg_waterf_yfac;
  if (!strcmp(name, "blanker_refpulse")) return blanker_refpulse;
  if (!strcmp(name, "blanker_phasefunc")) return blanker_phasefunc;
  if (!strcmp(name, "blanker_pulindex")) return blanker_pulindex;
  if (!strcmp(name, "fft1_filtercorr")) return fft1_filtercorr;
  if (!strcmp(name, "mix1_fqwin")) return mix1_fqwin;
  if (!strcmp(name, "bg_filterfunc")) return bg_filterfunc;
  if (!strcmp(name, "daout")) return daout;
  if (!strcmp(name, "blanker_flag")) return blanker_flag;
  if (!strcmp(name, "fft1_inverted_window")) return fft1_inverted_window;
  if (!strcmp(name, "liminfo_group_min")) return liminfo_group_min;
  return NULL;
}

/* ------------------------------------------------------------------ */
/* FFT kernel wrappers (fft0.c) — usable without ref_setup            */
/* ------------------------------------------------------------------ */

/* Run the reference complex forward FFT (fft0.c:641 fftforward) in
 * place on interleaved complex float data. */
int ref_fftforward(float *x, int size, int mo)
{
  int n = 0, s = size;
  while (s > 1) { s >>= 1; n++; }
  if ((1 << n) != size) return -1;
  COSIN_TABLE *tab = malloc((size_t)size * sizeof(COSIN_TABLE));
  short int *perm = malloc((size_t)2 * size * sizeof(short int));
  init_fft(mo, n, size, tab, perm);
  fftforward(size, n, x, tab, perm, 0);
  free(tab); free(perm);
  return 0;
}

int ref_fftback(float *x, int size, int mo)
{
  int n = 0, s = size;
  while (s > 1) { s >>= 1; n++; }
  if ((1 << n) != size) return -1;
  COSIN_TABLE *tab = malloc((size_t)size * sizeof(COSIN_TABLE));
  short int *perm = malloc((size_t)2 * size * sizeof(short int));
  init_fft(mo, n, size, tab, perm);
  fftback(size, n, x, tab, perm, 0);
  free(tab); free(perm);
  return 0;
}

/* Split-radix real-to-Hermitian forward transform (fft0.c:33). */
int ref_fft_real_to_hermitian(float *x, int size)
{
  int n = 0, s = size;
  while (s > 1) { s >>= 1; n++; }
  if ((1 << n) != size) return -1;
  COSIN_TABLE *tab = malloc((size_t)size * sizeof(COSIN_TABLE));
  make_sincos(2, size, tab);
  fft_real_to_hermitian(x, size, n, tab);
  free(tab);
  return 0;
}

/* ------------------------------------------------------------------ */
/* Input feed + wideband drive (wcw.c:974-1118 single-CPU protocol)   */
/* ------------------------------------------------------------------ */

/* Append interleaved int16 A/D words to the timf1 ring. */
void ref_feed(const short *words, long nwords)
{
  long i;
  short *t = (short *)timf1_char;
  long cap = timf1_bytes / 2;
  for (i = 0; i < nwords; i++) {
    t[(timf1p_pa / 2 + i) % cap] = words[i];
  }
  timf1p_pa = (int)((timf1p_pa + 2 * nwords) & timf1_bytemask);
}

/* Process every complete input block now in timf1.  Returns number of
 * fft1_b transforms done, or negative lirerr code. */
int ref_run_wideband(void)
{
  int done = 0;
  while (((timf1p_pa - timf1p_px + timf1_bytes) & timf1_bytemask)
         >= timf1_blockbytes) {
    fft1_b(timf1p_px, &fft1_float[fft1_pa], fftw_tmp, 0);
    timf1p_px = (timf1p_px + timf1_blockbytes) & timf1_bytemask;
    fft1_pa = (fft1_pa + fft1_mulblock) & fft1_mask;
    fft1_na = fft1_pa / fft1_block;
    if (fft1_nm != fft1n_mask) fft1_nm++;
    if (genparm[SECOND_FFT_ENABLE] == 0) {
      while (fft1_na != fft1_nb) do_fft1_c();
    } else {
      while (fft1_na != fft1_nb) {
        do_fft1_c();
        make_timf2();
      }
      first_noise_blanker();
      while (((timf2_pn2 - timf2_px + timf2_size) & timf2_mask)
             >= 4 * ui.rx_rf_channels * fft2_size) {
        /* one whole transform per chunk-loop pass (wcw.c:280-285);
         * the spur system reads the transform index from ffts_na/_nm,
         * maintained by the chunk loop (wcw.c:288-289) */
        ffts_na = fft2_na;
        ffts_nm = fft2_nm;
        make_fft2_status = FFT2_NOT_ACTIVE;
        while (make_fft2_status != FFT2_COMPLETE) {
          make_fft2();
          if (kill_all_flag) return -refapi_errcode;
        }
      }
    }
    if (kill_all_flag) return -refapi_errcode;
    done++;
  }
  /* selective-limiter update on the wakeup cadence (wcw.c:1124-1132):
   * once per drive call, after all pending transforms are processed */
  if (liminfo_auto && genparm[SECOND_FFT_ENABLE] != 0) {
    if (fft1_liminfo_cnt != local_fft1_liminfo_cnt) {
      fft1_update_liminfo();
      local_fft1_liminfo_cnt = fft1_liminfo_cnt;
    }
    if (fft2_liminfo_cnt != local_fft2_liminfo_cnt) {
      fft2_update_liminfo();
      local_fft2_liminfo_cnt = fft2_liminfo_cnt;
    }
    if (kill_all_flag) return -refapi_errcode;
  }
  return done;
}

/* explicit liminfo update for deterministic tests (use with
 * ref_set_liminfo_auto(0) and wg.fft_avg1num larger than the feed) */
int ref_update_liminfo(void)
{
  fft1_update_liminfo();
  local_fft1_liminfo_cnt = fft1_liminfo_cnt;
  if (kill_all_flag) return -refapi_errcode;
  return 0;
}

void ref_set_liminfo_auto(int on) { liminfo_auto = on; }

/* direct access to blanker scalar state for pinned-state parity tests */
int ref_set_var(const char *name, double val)
{
  if (!strcmp(name, "timf2_noise_floor")) {
    timf2_noise_floor = val; return 0; }
  if (!strcmp(name, "blanker_info_update_interval")) {
    blanker_info_update_interval = (int)val; return 0; }
  if (!strcmp(name, "min_delay_time")) {
    min_delay_time = val; return 0; }
  return -1;
}

double ref_get_var(const char *name)
{
  if (!strcmp(name, "timf2_noise_floor")) return timf2_noise_floor;
  if (!strcmp(name, "blnfit_range")) return blnfit_range;
  if (!strcmp(name, "blanker_info_update_interval"))
    return blanker_info_update_interval;
  if (!strcmp(name, "min_delay_time")) return min_delay_time;
  if (!strcmp(name, "timf2p_fit")) return timf2p_fit;
  if (!strcmp(name, "fft1_sumsq_counter")) return fft1_sumsq_counter;
  if (!strcmp(name, "fft1_liminfo_cnt")) return fft1_liminfo_cnt;
  return -999999.0;
}

/* ------------------------------------------------------------------ */
/* Narrowband: tune + drive (wcw.c:1566-1900 protocol)                */
/* ------------------------------------------------------------------ */

int ref_tune(double hz)
{
  int i;
  if (hz < mix1_lowest_fq) hz = mix1_lowest_fq;
  if (hz > mix1_highest_fq) hz = mix1_highest_fq;
  mix1_selfreq[0] = hz;
  old_mix1_selfreq = mix1_selfreq[0];
  mix1_point[0] = -1;
  new_baseb_flag = 3;
  init_baseband_sizes();
  make_baseband_graph(1);
  if (kill_all_flag || lir_status != LIR_OK)
    return refapi_errcode ? -refapi_errcode : lir_status;
  /* the clear_select counter reset (wcw.c:1750-1760): narrowband
   * consumption restarts at the newest calibrated transform */
  if (genparm[SECOND_FFT_ENABLE] == 0) {
    fft1_nx = fft1_nb; fft1_nc = fft1_nb;
    fft1_px = fft1_pb;
  } else {
    fft2_nc = fft2_na; fft2_nx = fft2_na;
  }
  timf3_pa = 0; timf3_px = 0; timf3_py = 0; timf3_ps = 0;
  timf3_pn = 0; timf3_pc = 0;
  fft3_pa = 0; fft3_px = 0;
  baseb_pa = 0; baseb_pb = 0; baseb_pc = 0; baseb_pd = 0; baseb_pe = 0;
  baseb_pf = 0; baseb_ps = 0; baseb_pm = 0; baseb_pn = 0; baseb_py = 0;
  baseb_px = 0; baseb_fx = 0;
  daout_pa = 0; daout_px = 0; daout_py = 0;
  da_resample_ratio = genparm[DA_OUTPUT_SPEED] / baseband_sampling_speed;
  new_da_resample_ratio = da_resample_ratio;
  for (i = 0; i < genparm[MIX1_NO_OF_CHANNELS]; i++) mix1_status[i] = 0;
  clear_coherent();
  for (i = 0; i < timf3_block; i++) timf3_float[i] = 0;
  new_baseb_flag = 0;   /* audio may flow immediately (headless) */
  mg.avgnum = 0;        /* keep the S-meter writer off (see ref_setup) */
  return 0;
}

/* Host-side capture of demodulated audio (baseb_out, two floats per
 * baseband point) between baseb_py and baseb_pa; advances baseb_py so
 * the do_mix2 flow-control guard never stalls. */
/* Drive the D/A output conversion — rx_output's make_audio_signal core
 * (rxout.c:970-1639): squelch, Lagrange fractional resampling to the
 * D/A rate, AGC gain application, BFO product / FM upsampling IIR, and
 * int8/int16 conversion into the daout ring.  make_daout_gain is
 * normally the baseband graph's mouse handler (baseb_graph.c:2963);
 * headless we call it once for the deterministic default gain. */
int ref_run_output(void)
{
  int guard = 1 << 18;
  /* rx_output's init (rxout.c:305-336) runs in the output thread and
   * reads the D/A soundcard block size; headless we set the same
   * fields deterministically. */
  snd[RXDA].framesize = rx_daout_bytes * rx_daout_channels;
  snd[RXDA].block_bytes = 256 * snd[RXDA].framesize;
  baseb_output_block = snd[RXDA].block_bytes / (2 * da_resample_ratio);
  if (baseb_output_block < 16) baseb_output_block = 16;
  baseb_min_block = 1 + 1 / da_resample_ratio;
  if (baseb_min_block < baseb_output_block / 16)
    baseb_min_block = baseb_output_block / 16;
  make_daout_gain();
  allow_audio = TRUE;
  for (;;) {
    int before = daout_pa;
    make_audio_signal();
    if (kill_all_flag) return -refapi_errcode;
    if (daout_pa == before || guard-- <= 0) break;
  }
  return 0;
}

/* Consume D/A frames as (L,R) int16 pairs. */
long ref_consume_daout(short *dst, long max_frames)
{
  long n = 0;
  int mm = rx_daout_bytes * rx_daout_channels;
  while (daout_px != daout_pa && n < max_frames) {
    if (rx_daout_bytes == 2) {
      short *p = (short *)&daout[daout_px];
      dst[2 * n] = p[0];
      dst[2 * n + 1] = (rx_daout_channels == 2) ? p[1] : p[0];
    } else {
      dst[2 * n] = (short)((unsigned char)daout[daout_px] - 0x80);
      dst[2 * n + 1] = (rx_daout_channels == 2)
          ? (short)((unsigned char)daout[daout_px + 1] - 0x80)
          : dst[2 * n];
    }
    daout_px = (daout_px + mm) & daout_bufmask;
    n++;
  }
  return n;
}

long ref_consume_audio(float *dst, long max_points)
{
  long n = 0;
  while (baseb_py != baseb_pa && n < max_points) {
    dst[2 * n] = baseb_out[2 * baseb_py];
    dst[2 * n + 1] = baseb_out[2 * baseb_py + 1];
    baseb_py = (baseb_py + 1) & baseband_mask;
    n++;
  }
  return n;
}

/* Capture filtered complex baseband (baseb_raw) between baseb_px-past
 * positions; caller tracks its own read pointer. */
long ref_read_baseb_raw(float *dst, long start, long npoints)
{
  long i;
  for (i = 0; i < npoints; i++) {
    long p = (start + i) & baseband_mask;
    dst[2 * i] = baseb_raw[2 * p];
    dst[2 * i + 1] = baseb_raw[2 * p + 1];
  }
  return npoints;
}

/* Run the narrowband chain over everything pending: mix1 -> fft3 ->
 * mix2, using the exact thread-loop guards (fft3.c:35-66 and
 * mix2.c:41-64). */
int ref_run_narrowband(void)
{
  int guard = 1 << 22;
  for (;;) {
    int progressed = 0;
    /* fixed-tune mix1 guard (wcw.c:1706-1712 / :1741-1746): consume
     * transforms fft1_nx..fft1_nb (or fft2_nx..fft2_na) while timf3
     * has a block of room */
    if (genparm[SECOND_FFT_ENABLE] == 0) {
      if (fft1_nb != fft1_nx &&
          ((timf3_px - timf3_pa + timf3_mask) & timf3_mask)
            >= (long)timf3_block) {
        fft1_mix1_fixed();
        progressed = 1;
      }
    } else {
      if (fft2_na != fft2_nx &&
          ((timf3_px - timf3_pa + timf3_mask) & timf3_mask)
            >= (long)timf3_block) {
        fft2_mix1_fixed();
        progressed = 1;
      }
    }
    if (kill_all_flag) return -refapi_errcode;
    /* fft3 thread loop guard (fft3.c:56-58) */
    while (((timf3_pa - timf3_px + timf3_size) & timf3_mask)
               >= twice_rxchan * fft3_size &&
           ((fft3_pa - fft3_px + fft3_totsiz) & fft3_mask)
               < fft3_totsiz - 2 * fft3_block) {
      make_fft3_all();
      progressed = 1;
      if (kill_all_flag) return -refapi_errcode;
    }
    /* mix2 thread loop guard (mix2.c:58-60) */
    while (((fft3_pa - fft3_px + fft3_totsiz) & fft3_mask) >= fft3_block &&
           ((baseb_pa - baseb_py + baseband_size) & baseband_mask)
               < baseband_size - 4 * (int)mix2.size) {
      fft3_mix2();
      progressed = 1;
      if (kill_all_flag) return -refapi_errcode;
    }
    if (!progressed) break;
    if (--guard <= 0) return -900200;
  }
  return 0;
}

/* single-stage steppers for debugging/bisection */
int ref_step_mix1(void)
{
  if (genparm[SECOND_FFT_ENABLE] == 0) {
    if (fft1_nb != fft1_nx &&
        ((timf3_px - timf3_pa + timf3_mask) & timf3_mask)
          >= (long)timf3_block) { fft1_mix1_fixed(); return 1; }
  } else {
    if (fft2_na != fft2_nx &&
        ((timf3_px - timf3_pa + timf3_mask) & timf3_mask)
          >= (long)timf3_block) { fft2_mix1_fixed(); return 1; }
  }
  return 0;
}

int ref_step_fft3(void)
{
  if (((timf3_pa - timf3_px + timf3_size) & timf3_mask)
          >= twice_rxchan * fft3_size &&
      ((fft3_pa - fft3_px + fft3_totsiz) & fft3_mask)
          < fft3_totsiz - 2 * fft3_block) {
    make_fft3_all();
    return kill_all_flag ? -refapi_errcode : 1;
  }
  return 0;
}

int ref_step_mix2(void)
{
  if (((fft3_pa - fft3_px + fft3_totsiz) & fft3_mask) >= fft3_block &&
      ((baseb_pa - baseb_py + baseband_size) & baseband_mask)
          < baseband_size - 4 * (int)mix2.size) {
    fft3_mix2();
    return kill_all_flag ? -refapi_errcode : 1;
  }
  return 0;
}

/* run the reference's own arena canary checks now (buf.c:2105-2114);
 * returns the lirerr code (1240) if corruption was found, else 0 */
int ref_memcheck(void)
{
  int before = refapi_errcode;
  refapi_errcode = 0;
  if (fft1_handle != NULL) memcheck(97, fft1mem, &fft1_handle);
  if (baseband_handle != NULL) memcheck(97, basebmem, &baseband_handle);
  if (fft3_handle != NULL) memcheck(97, fft3mem, &fft3_handle);
  if (hires_handle != NULL) memcheck(97, hiresmem, &hires_handle);
  if (blanker_handle != NULL) memcheck(97, blankermem, &blanker_handle);
  int rc = refapi_errcode;
  refapi_errcode = before;
  kill_all_flag = 0;
  return rc;
}

int ref_errcode(void) { return refapi_errcode; }
int ref_lir_status(void) { return lir_status; }

/* ------------------------------------------------------------------ */
/* Second-round stubs: symbols referenced by wcw/graph files but never
 * reached headless (hardware control, extio, mouse hooks, ALSA).     */
/* ------------------------------------------------------------------ */

int adjust_scale(double *step)
{  /* same semantics as the reference ui utility: round the scale step
    * up to the nearest 1/2/5 x 10^n */
  int pot = 0, i;
  double t1 = step[0];
  while (t1 > 10) { t1 /= 10; pot++; }
  if (t1 < 0.00001) t1 = .00001;
  while (t1 < 1) { t1 *= 10; pot--; }
  if (t1 <= 2) { t1 = 2; i = 2; }
  else if (t1 <= 5) { t1 = 5; i = 5; }
  else { t1 = 10; i = 1; }
  while (pot > 0) { t1 *= 10; pot--; }
  while (pot < 0) { t1 /= 10; pot++; }
  step[0] = t1;
  return i;
}
void clear_hware_data(void) {}
/* rxout.c soundcard-output hooks: no D/A device headless (rx_audio_out
 * stays negative, so these are never reached by make_audio_signal). */
void lir_empty_da_device_buffer(void) {}
void lir_rx_dawrite(void) {}
void sys_func(int no) { (void)no; }   /* soundcard open/close dispatch */
void dual_graph_borders(WG_PARMS *a, unsigned char c) { (void)a; (void)c; }
void erase_numinput_txt(void) {}
char lir_inb(int port) { (void)port; return 0; }
void process_current_lir_inkey(void) {}
void set_button_states(void) {}
void set_hardware_rx_frequency(void) {}
void set_hardware_rx_gain(void) {}
void show_button(BUTTONS *b, char *s) { (void)b; (void)s; }
void txtest_init(void) {}
void update_bar(int x1, int x2, int yzer, int old_y, int new_y,
                unsigned char color, char *txt)
                 { (void)x1;(void)x2;(void)yzer;(void)old_y;(void)new_y;
                   (void)color;(void)txt; }
void update_snd(int sound_type) { (void)sound_type; }
void users_eme(void) {}
int vg_tau_to_xpix(double tau) { (void)tau; return 0; }
double zt(void) { return 0.0; }
void qq2(char *s) { (void)s; }
double q_time = 0.0;
WSE_PARM wse;
void *alsa_handle[4] = {0, 0, 0, 0};
int alsa_library_flag = 0;
long snd_pcm_avail(void *h) { (void)h; return -1; }
void *dev_airspyhf = 0;
int (*airspyhf_set_optimal_iq_correction_point)(void *, float) = 0;
char *eme_allcalls_filename = "eme_allcalls";
char *eme_call3_filename = "eme_call3";
char *eme_dirskd_filename = "eme_dirskd";
char *eme_dxdata_filename = "eme_dxdata";
char *eme_emedta_filename = "eme_emedta";
char *eme_error_report_file = "eme_errors";
char *eme_own_info_filename = "eme_own_info";
void *extio_handle = 0;
int ftdi_library_flag = 0;
int hware_flag = 0;
int libusb0_library_flag = 0;
int libusb1_library_flag = 0;
int mirisdr_library_flag = 0;
int rtlsdr_library_flag = 0;
void get_extio_name(char *name) { name[0] = 0; }
void mouse_on_elektor_graph(void) {}
void mouse_on_fcdproplus_graph(void) {}
void mouse_on_radar_graph(void) {}
void mouse_on_tx_graph(void) {}
void mouse_on_users_graph(void) {}
#define PARMINFO(fn) int fn(int *line) { (void)line; return 0; }
PARMINFO(display_sdr14_parm_info)
PARMINFO(display_sdrip_parm_info)
PARMINFO(display_rtl2832_parm_info)
PARMINFO(display_perseus_parm_info)
PARMINFO(display_pcie9842_parm_info)
PARMINFO(display_openhpsdr_parm_info)
PARMINFO(display_netafedri_parm_info)
PARMINFO(display_mirics_parm_info)
PARMINFO(display_fdms1_parm_info)
PARMINFO(display_excalibur_parm_info)
PARMINFO(display_cloudiq_parm_info)
PARMINFO(display_bladerf_parm_info)
PARMINFO(display_airspyhf_parm_info)
PARMINFO(display_airspy_parm_info)
PARMINFO(display_sdrplay2_parm_info)
PARMINFO(display_sdrplay3_parm_info)


/* ------------------------------------------------------------------ */
/* Machine-Morse front end driver (coherent.c:156/283, cwspeed.c:577) */
/*                                                                    */
/* The reference's own state machine cannot reach these routines: the */
/* CWDETECT_CLEARED case hard-returns before detect_cw_speed          */
/* (coherent.c:297 "return;//oo..."), cw_decode_region is "do         */
/* nothing" (cwdetect.c:4388) and init_cw_decode / first_detect force */
/* CWDETECT_DEBUG_STOP (cwdetect.c:4395/3306).  These entries drive   */
/* the COMPLETE, reachable-by-hand part — ramp collection, keying-    */
/* spectrum speed estimation, ideal-waveform construction and         */
/* detect_cw_speed's dash-fitting iteration — headless, exactly as    */
/* the CLEARED case would have done without its early return.         */
/* Requires ref_enable_cw_decode(1) BEFORE ref_setup (the CW buffers  */
/* are only allocated when genparm[CW_DECODE_ENABLE] is set at        */
/* buffer-allocation time, baseb_graph.c:746-770) and afc_enable=1    */
/* (buf.c:840 zeroes CW_DECODE_ENABLE without AFC).                   */
/* ------------------------------------------------------------------ */

void collect_ramp(void);
void make_ideal_waveform(void);
void detect_cw_speed(void);
float evaluate_keying_spectrum(void);

/* Several reference loops in this (unfinished, see above) subsystem
 * have no iteration bound and spin forever on noise-dominated ramps:
 * collect_ramp's key-up walk steps by |baseb_ramp[pc]| and ping-pongs
 * between baseb_pe and the guard when no >=2.5*cwbit key-up region
 * exists (coherent.c:198-208) — nothing advances baseb_pe because the
 * stages that would (first_find_parts etc.) are DEBUG_STOPped in the
 * source.  Guard the calls with SIGALRM + siglongjmp so a spin is a
 * recordable RESULT (-2), not a hung test process. */
#include <setjmp.h>
static sigjmp_buf cw_jmp;
static void cw_alarm_handler(int sig) { (void)sig; siglongjmp(cw_jmp, 1); }
#define CW_GUARD_BEGIN(secs) \
  if (sigsetjmp(cw_jmp, 1)) { alarm(0); signal(SIGALRM, SIG_DFL); return -2; } \
  signal(SIGALRM, cw_alarm_handler); alarm(secs)
#define CW_GUARD_END() do { alarm(0); signal(SIGALRM, SIG_DFL); } while (0)

/* run collect_ramp over the data between baseb_pc and baseb_pb, as
 * the CWDETECT_CLEARED tick does (coherent.c:290-297): update the
 * cwbit estimate first (it sets the long-key-up threshold inside
 * collect_ramp), then extend the ramp.  bitpts <= 0 keeps the current
 * cwbit_pts. */
int ref_cw_collect(double bitpts)
{
  if (!refapi_setup_done || genparm[CW_DECODE_ENABLE] == 0) return -1;
  if (bitpts > 0) cwbit_pts = bitpts;
  if (cwbit_pts <= 0) return 0;   /* no speed guess yet: nothing safe to do */
  CW_GUARD_BEGIN(5);
  collect_ramp();
  CW_GUARD_END();
  return kill_all_flag ? -refapi_errcode : 0;
}

/* keying-spectrum fundamental -> cwbit estimate in baseband points
 * (the CWDETECT_CLEARED flow, coherent.c:294-297) */
double ref_cw_keying_eval(void)
{
  float pos;
  if (keying_spectrum_cnt == 0) return -1.0;
  pos = evaluate_keying_spectrum();
  if (pos <= 0) return -1.0;
  return 0.5 * mix2.size / pos;
}

/* full speed-detection flow from a given cwbit guess; returns the
 * resulting cw_detect_flag (CWDETECT_WAVEFORM_ESTABLISHED == success)
 * or negative lirerr code */
int ref_cw_speed(double bitpts)
{
  if (!refapi_setup_done || genparm[CW_DECODE_ENABLE] == 0) return -1;
  cwbit_pts = bitpts;
  CW_GUARD_BEGIN(60);
  collect_ramp();
  if (kill_all_flag) { CW_GUARD_END(); return -refapi_errcode; }
  make_ideal_waveform();
  if (kill_all_flag) { CW_GUARD_END(); return -refapi_errcode; }
  no_of_cwdat = 0;
  detect_cw_speed();
  CW_GUARD_END();
  if (kill_all_flag) return -refapi_errcode;
  return cw_detect_flag;
}

double ref_cw_get(const char *name)
{
  if (!strcmp(name, "cwbit_pts")) return cwbit_pts;
  if (!strcmp(name, "dash_pts")) return dash_pts;
  if (!strcmp(name, "dash_sumsq")) return dash_sumsq;
  if (!strcmp(name, "cw_avg_points")) return cw_avg_points;
  if (!strcmp(name, "no_of_cwdat")) return no_of_cwdat;
  if (!strcmp(name, "cw_detect_flag")) return cw_detect_flag;
  if (!strcmp(name, "keying_spectrum_cnt")) return keying_spectrum_cnt;
  if (!strcmp(name, "keying_spectrum_size")) return keying_spectrum_size;
  if (!strcmp(name, "baseb_pa")) return baseb_pa;
  if (!strcmp(name, "baseb_pb")) return baseb_pb;
  if (!strcmp(name, "baseb_pc")) return baseb_pc;
  if (!strcmp(name, "baseb_pe")) return baseb_pe;
  if (!strcmp(name, "baseb_px")) return baseb_px;
  if (!strcmp(name, "cg_code_unit")) return cg_code_unit;
  return -999999.0;
}

/* detected dashes: midpoint (baseband points) + ramp length; returns
 * count written */
long ref_cw_dashes(float *mid, int *len, long maxn)
{
  long i, n = no_of_cwdat;
  if (n > maxn) n = maxn;
  for (i = 0; i < n; i++) {
    mid[i] = cw[i].midpoint;
    len[i] = cw[i].len;
  }
  return n;
}


/* ------------------------------------------------------------------ */
/* Spur canceller driver (spur.c:36, spursub.c:177, wcw.c:203-246)    */
/*                                                                    */
/* Requires ref_enable_spurs(N) BEFORE ref_setup and afc_enable=2     */
/* (auto spur search; buf.c:837 zeroes MAX_NO_OF_SPURS without AFC).  */
/* eliminate_spurs itself runs inside make_fft2 / fft1_c once spurs   */
/* are locked, so the existing ref_run_wideband subtracts in place.   */
/* ------------------------------------------------------------------ */

void init_spur_elimination(void);
extern float spur_search_threshold;   /* file-scope in spursub.c:38 */

/* the spur_removal() auto-search pass (wcw.c:209-236), bounded */
int ref_spur_scan(void)
{
  int guard = 0;
  if (!refapi_setup_done || genparm[MAX_NO_OF_SPURS] <= 0) return -1;
  if (genparm[SECOND_FFT_ENABLE]) { ffts_na = fft2_na; ffts_nm = fft2_nm; }
  else                            { ffts_na = fft1_nb; ffts_nm = fft1_nm; }
  while (autospur_point < spur_search_last_point
         && no_of_spurs < genparm[MAX_NO_OF_SPURS]
         && guard++ < 100000) {
    init_spur_elimination();
    if (kill_all_flag) return -refapi_errcode;
  }
  return no_of_spurs;
}

double ref_spur_get(const char *name)
{
  if (!strcmp(name, "no_of_spurs")) return no_of_spurs;
  if (!strcmp(name, "autospur_point")) return autospur_point;
  if (!strcmp(name, "spur_search_first_point"))
    return spur_search_first_point;
  if (!strcmp(name, "spur_search_last_point"))
    return spur_search_last_point;
  if (!strcmp(name, "spur_search_threshold"))
    return spur_search_threshold;
  if (!strcmp(name, "spursearch_sum_counter"))
    return spursearch_sum_counter;
  if (!strcmp(name, "spur_speknum")) return spur_speknum;
  return -999999.0;
}

/* per-spur state: location (bin), fractional frequency, lock flag,
 * amplitude; returns count written */
long ref_spur_list(int *loc, float *freq, int *flag, float *ampl,
                   long maxn)
{
  long i, n = no_of_spurs;
  if (n > maxn) n = maxn;
  for (i = 0; i < n; i++) {
    loc[i] = spur_location[i];
    freq[i] = spur_freq[i];
    flag[i] = spur_flag[i];
    ampl[i] = spur_ampl[i];
  }
  return n;
}
